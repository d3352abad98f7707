package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the cleaning / span-dedup operators — the
  * invariants their scaladocs promise, checked over generated corpora
  * in one Spark job per property (per-sample jobs would be painfully
  * slow). */
class CleaningPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "12", "x")
  private val line: Gen[String] =
    Gen.chooseNum(0, 9).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))

  test("dedupLinesInDoc invariants over adversarial texts: counts, idempotence, membership") {
    val weird = Gen.oneOf("", " ", "\t", "a|b", "(x)", "[y]", "{z}", "\\", "$1",
      "^start", "end$", "a.b*c+", "é ü ß", "日本語", "emoji 🙂 line")
    val anyLine = Gen.oneOf(line, weird)
    val text: Gen[String] = Gen.chooseNum(0, 8)
      .flatMap(k => Gen.listOfN(k, anyLine)).map(_.mkString("\n"))
    val rows = samples(text, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Cleaning.dedupLinesInDoc(rows).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val input = rows.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    input.foreach { case (id, t) =>
      val (dedup, nLines, nUniq) = out(id)
      val lines = t.split("\n", -1).toSeq
      assert(nLines == lines.length && nUniq == lines.distinct.length, s"doc $id counts")
      // output IS the first-occurrence subsequence of the input lines
      assert(dedup.split("\n", -1).toSeq == lines.distinct, s"doc $id content")
    }
    // idempotence over the whole generated corpus
    val once = Cleaning.dedupLinesInDoc(rows)
      .select(col("doc_id"), col("text_dedup").as("text"))
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    Cleaning.dedupLinesInDoc(once).collect().foreach { r =>
      assert(r.getString(1) == out(r.getLong(0))._1, s"doc ${r.getLong(0)} not idempotent")
    }
  }

  test("rakeKeywords never throws and keeps rank/score invariants over adversarial texts") {
    val weird = Gen.oneOf("", "   ", "the the the", "a-b c.d!e", "é ü",
      "12 34 56", "x" * 40, "the a of and", "\tmixed\ncase\rstuff")
    val text: Gen[String] = Gen.oneOf(line, weird, Gen.zip(line, line)
      .map { case (a, b) => s"$a the $b" })
    val rows = samples(text, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.rakeKeywords(rows, Seq("the", "a", "of", "and"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    got.groupBy(_._1).foreach { case (id, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1L to rs.length), s"doc $id ranks $ranks")
      // scores weakly decrease in rank; every phrase scores >= 1 (a
      // single word contributes deg/freq >= 1)
      val byRank = rs.sortBy(_._2).map(_._4).toSeq
      assert(byRank == byRank.sorted.reverse, s"doc $id score order")
      assert(byRank.forall(_ >= 1.0), s"doc $id score floor")
      rs.foreach { case (_, _, p, _) =>
        assert(p.nonEmpty && !p.contains("|"), s"doc $id phrase '$p'")
      }
    }
  }

  test("redactPii is idempotent and digit-free over its own PII forms") {
    val piiBit = Gen.oneOf(
      Gen.chooseNum(0, 999).map(n => s"user$n@host$n.example.org"),
      Gen.chooseNum(0, 255).map(n => s"10.$n.0.${n % 100}"),
      Gen.chooseNum(0, 9999).map(n => f"123-45-$n%04d"),
      Gen.chooseNum(0, 9999).map(n => f"555-123-$n%04d"),
      Gen.oneOf("alpha", "beta", "gamma", "delta")) // digit-free filler
    val textGen = Gen.listOfN(6, piiBit).map(_.mkString(" "))
    val docs = samples(textGen, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = Cleaning.redactPii(docs)
      .select(col("doc_id"), col("text_redacted").as("text"))
    val twice = Cleaning.redactPii(once)
    val rows = twice.collect()
    // second pass finds nothing: counts all zero, text unchanged
    assert(rows.forall(r => (2 to 5).forall(r.getLong(_) == 0L)))
    val onceMap = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(r => r.getString(1) == onceMap(r.getLong(0))))
    // every generated digit run belonged to SOME pii form → none survive
    assert(onceMap.values.forall(!_.exists(_.isDigit)))
  }

  test("removeBoilerplate conserves lines: kept + dropped = total, kept ⊆ input") {
    val docGen = Gen.chooseNum(1, 6)
      .flatMap(k => Gen.listOfN(k, line)).map(_.mkString("\n"))
    val texts = samples(docGen, 200)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Cleaning.removeBoilerplate(docs, minWords = 2, maxLineDocFreq = 3)
      .collect()
    val byId = texts.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap
    out.foreach { r =>
      val (id, clean, kept, dropped) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      val inLines = byId(id).split("\n", -1)
      assert(kept + dropped == inLines.length)
      val outLines = clean.split("\n", -1)
      assert(outLines.length == kept)
      // kept lines appear in the input in order (subsequence)
      val it = inLines.iterator
      assert(outLines.forall(l => it.contains(l)))
    }
  }

  test("repeatedSpans never misses a planted cross-document run") {
    val n = 3
    val planted = "zulu yankee xray whiskey victor" // 5 tokens, unique words
    val prefix = Gen.chooseNum(0, 6).flatMap(k => Gen.listOfN(k, word))
    val suffix = Gen.chooseNum(0, 6).flatMap(k => Gen.listOfN(k, word))
    val docGen = for (p <- prefix; s <- suffix) yield (p, s)
    val parts = samples(docGen, 40)
    val docs = parts.zipWithIndex.map { case ((p, s), i) =>
      (i.toLong, (p :+ planted).concat(s).mkString(" "), p.length)
    }.toDF("doc_id", "text", "plant_pos")
    val spans = Dedup.repeatedSpans(docs.select("doc_id", "text"), n, 1)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
    // the planted run [pos, pos+5) must be fully covered in EVERY doc
    docs.select("doc_id", "plant_pos").collect().foreach { r =>
      val (id, pos) = (r.getLong(0), r.getInt(1).toLong)
      val covered = spans.getOrElse(id, Seq.empty)
        .exists { case (s, e) => s <= pos && pos + 5 <= e }
      assert(covered, s"doc $id: planted run at $pos not covered: ${spans.get(id)}")
    }
  }

  test("extractText is idempotent and never leaks script/style content over generated HTML") {
    val tag = Gen.oneOf("<div>", "</div>", "<p class=\"x\">", "<br>",
      "<script>var SECRETJS = 1;</script>", "<style>.SECRETCSS {}</style>",
      "<!-- SECRETCOMMENT -->", "<SPAN>", "</ SPAN>", "<img src='a.png'>")
    val piece = Gen.oneOf(tag, line, Gen.oneOf("&amp;", "&lt;", "&gt;",
      "&nbsp;", "&#39;", "&amp;lt;", "plain words here"))
    val html: Gen[String] = Gen.chooseNum(0, 12)
      .flatMap(k => Gen.listOfN(k, piece)).map(_.mkString(" "))
    val rows = samples(html, 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = Cleaning.extractText(rows)
      .select(col("doc_id"), col("text_clean").as("text"))
    val onceRows = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // no script/style/comment CONTENT survives
    onceRows.values.foreach { t =>
      assert(!t.contains("SECRETJS") && !t.contains("SECRETCSS") &&
        !t.contains("SECRETCOMMENT"), t)
    }
    // idempotence on tag-free text: a second pass is the identity
    // (&amp;lt; decodes one level to &lt; — decoding is NOT idempotent
    // by design, so compare after one extra decode-free normalization:
    // texts without '&' entities and '<' tags must round-trip exactly)
    val twice = Cleaning.extractText(once).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    onceRows.foreach { case (id, t) =>
      if (!t.contains("&") && !t.contains("<")) {
        assert(twice(id) == t, s"doc $id not idempotent: '$t' -> '${twice(id)}'")
      }
    }
  }

  test("rangeJoin is bin-width invariant over random points and intervals") {
    val pts = (0L until 300L).map(i => (i, (i * 6151L % 2000L) - 700L))
      .toDF("pid", "p")
    val ivs = (0L until 40L).map { k =>
      val s0 = (k * 997L % 1800L) - 800L
      (k, s0, s0 + (k % 11) * 37L)  // widths 0 (degenerate) .. 370
    }.toDF("iid", "s", "e")
    def run(w: Long): Seq[(Long, Long)] =
      graft.util.SparkUtil.rangeJoin(pts, "p", ivs, "s", "e", w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val base = run(1L)
    assert(base.nonEmpty)
    for (w <- Seq(7L, 64L, 1000L, 100000L))
      assert(run(w) == base, s"binWidth $w changed the result")
  }
}
