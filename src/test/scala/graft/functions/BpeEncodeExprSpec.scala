package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge application vs an independently-written JVM reference
  * encoder, plus the invariants the oracle's bounded unroll relies on. */
class BpeEncodeExprSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Seq(
    "a" -> "t", "e" -> "r", "o" -> "r", "t" -> "h", "th" -> "e",
    "j" -> "o", "jo" -> "i", "joi" -> "n", "s" -> "c", "sc" -> "a",
    "sca" -> "n", "or" -> "t", "s" -> "ort", "er" -> "y",
    "at" -> "a", "d" -> "ata")

  /** Independent reference: immutable-Vector rewrite of the same
    * documented semantics (one leftmost-best-rank merge per round). */
  private def refEncode(word: String, ms: Seq[(String, String)],
                        maxRounds: Int): Seq[String] = {
    val rank = ms.zipWithIndex.toMap
    var parts = word.toSeq.map(_.toString).toVector
    var rounds = 0
    var cont = true
    while (cont && rounds < maxRounds && parts.size > 1) {
      val cand = parts.indices.dropRight(1)
        .flatMap(j => rank.get((parts(j), parts(j + 1))).map(r => (r, j)))
      if (cand.isEmpty) cont = false
      else {
        val (_, j) = cand.min // (rank, pos): lowest rank, then leftmost
        parts = parts.patch(j, Vector(parts(j) + parts(j + 1)), 2)
        rounds += 1
      }
    }
    parts
  }

  test("matches the JVM reference on every vocabulary word, both eval modes") {
    val words = Seq("join", "hash", "row", "batch", "scan", "customer",
      "column", "filter", "small", "slow", "merge", "order", "vector",
      "line", "table", "data", "agg", "value", "key", "stream", "window",
      "spark", "a", "part", "group", "big", "sort", "query", "fast",
      "the", "dup", "", "atat", "thethe", "sortsort")
    val df = words.toDF("w").repartition(3)
      .select(col("w"), BpeEncodeExpr(col("w"), merges, 8).as("p"))
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
        for (w <- words)
          assert(got(w) == refEncode(w, merges, 8), s"mode=$mode word=$w")
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("hand-pinned encodings: full merges, rank priority, partial fixpoints") {
    val got = Seq("data", "the", "join", "scan", "sort", "order", "query",
      "merge").toDF("w")
      .select(col("w"), BpeEncodeExpr(col("w"), merges, 8).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("data") == Seq("data"))   // (a,t) → (at,a) → (d,ata)
    assert(got("the") == Seq("the"))     // (t,h) → (th,e)
    assert(got("join") == Seq("join"))   // three chained rounds
    assert(got("scan") == Seq("scan"))
    assert(got("sort") == Seq("sort"))   // (o,r) → (or,t) → (s,ort)
    // rank priority: (e,r) rank 1 fires before (o,r) rank 2
    assert(got("order") == Seq("or", "d", "er"))
    assert(got("query") == Seq("q", "u", "ery"))
    assert(got("merge") == Seq("m", "er", "g", "e"))
  }

  test("reconstruction invariant and bounded-round prefix semantics") {
    // pieces always concatenate back to the word; and maxRounds = k is
    // exactly the first k rounds of the fixpoint run (what the oracle's
    // CTE unroll computes per round)
    val words = Seq("sort", "data", "order", "thequery", "ata", "")
    for (w <- words; k <- 1 to 8) {
      val got = Seq(w).toDF("w")
        .select(BpeEncodeExpr(col("w"), merges, k)).head().getSeq[String](0)
      assert(got.mkString == w, s"reconstruction broke: $w rounds=$k")
      assert(got == refEncode(w, merges, k), s"bounded run diverged: $w rounds=$k")
    }
  }

  test("tie on rank resolves to the LEFTMOST occurrence") {
    // "erer": (e,r) applies at pos 0 and pos 2 with the same rank —
    // leftmost merges first; then the other
    val got = Seq("erer").toDF("w")
      .select(BpeEncodeExpr(col("w"), merges, 1).as("one"),
        BpeEncodeExpr(col("w"), merges, 8).as("all"))
      .head()
    assert(got.getSeq[String](0) == Seq("er", "e", "r"))
    assert(got.getSeq[String](1) == Seq("er", "er"))
  }

  test("null word stays null; rejects bad parameters") {
    val r = spark.sql("SELECT CAST(NULL AS STRING) AS w")
      .select(BpeEncodeExpr(col("w"), merges, 8)).head()
    assert(r.isNullAt(0))
    intercept[IllegalArgumentException] {
      BpeEncodeExpr(col("w"), Seq.empty, 8)
    }
    intercept[IllegalArgumentException] {
      BpeEncodeExpr(col("w"), merges, 0)
    }
    intercept[IllegalArgumentException] {
      BpeEncodeExpr(col("w"), merges ++ Seq("a" -> "t"), 8)
    }
  }

  test("bpeApply: per-doc render, counts, null exclusion, empty text") {
    val d = Seq(
      (1L, "data the join"),
      (2L, "order query"),
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.analytics.TextAnalysis.bpeApply(d, merges, 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "data the join", 3L, 3L),
      (2L, "or d er q u ery", 6L, 2L),
      (3L, "", 0L, 1L)))
  }
}
