package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic unit tests for the document-cleaning operators on
  * hand-built inputs (the DuckDB oracle checks engine-vs-engine
  * equality; these check the rules do what they claim). */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("removeBoilerplate: pattern, min-words, and corpus-frequency rules") {
    val banner = "Please enable JavaScript to view this site"
    val footer = "shared navigation footer appears on every page"
    val d = docs(
      1L -> s"unique body line one with plenty of words\n$banner\n$footer\nok",
      2L -> s"another unique body line with many words here\n$footer",
      3L -> s"third unique body line of text\n$footer\nSHARED NAVIGATION   footer appears on every page")
    val out = Cleaning.removeBoilerplate(d, minWords = 3, maxLineDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // banner: pattern rule (case-insensitive via lower); "ok": min-words;
    // footer: appears in 3 distinct docs (> 2) — corpus rule, and doc 3's
    // case/whitespace variant normalizes to the same line identity
    assert(out(1L).getString(1) == "unique body line one with plenty of words")
    assert(out(1L).getLong(2) == 1 && out(1L).getLong(3) == 3)
    assert(out(2L).getString(1) == "another unique body line with many words here")
    assert(out(3L).getString(1) == "third unique body line of text")
    assert(out(3L).getLong(3) == 2)
  }

  test("removeBoilerplate: boilerplate-only documents are dropped, order kept") {
    val d = docs(
      1L -> "keep alpha first line here\nsecond alpha line also kept fine",
      2L -> "see our privacy policy for details\nok")
    val out = Cleaning.removeBoilerplate(d).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L)) // doc 2 fully boilerplate
    assert(out.head.getString(1) ==
      "keep alpha first line here\nsecond alpha line also kept fine")
  }

  test("removeBoilerplate: frequency threshold counts DISTINCT docs") {
    val dup = "repeated inside one single document only"
    val d = docs(
      1L -> s"$dup\n$dup\n$dup\nplus one unique line of text",
      2L -> "entirely unrelated second document body line")
    // 3 occurrences but 1 distinct doc — NOT corpus-frequent at df > 2
    val out = Cleaning.removeBoilerplate(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 4)
  }

  test("redactPii: every category replaced and counted, order-safe") {
    val d = docs(
      1L -> ("write to jane.doe+x@mail-host.example.org or call 555-123-4567, " +
        "server at 192.168.0.1, ssn 078-05-1120"),
      2L -> "no pii in this one at all")
    val out = Cleaning.redactPii(d).collect().map(r => r.getLong(0) -> r).toMap
    val t1 = out(1L).getString(1)
    assert(t1.contains("<EMAIL>") && t1.contains("<PHONE>") &&
      t1.contains("<IP>") && t1.contains("<SSN>"))
    assert(!t1.exists(_.isDigit), s"digits survived redaction: $t1")
    assert((2 to 5).map(out(1L).getLong) == Seq(1L, 1L, 1L, 1L))
    assert(out(2L).getString(1) == "no pii in this one at all")
    assert((2 to 5).map(out(2L).getLong) == Seq(0L, 0L, 0L, 0L))
  }

  test("redactPii: email local-part digits and dots never leak into IP/phone") {
    val d = docs(1L -> "mail 555.123.4567@example.com then ip 10.0.0.255 end")
    val r = Cleaning.redactPii(d).collect().head
    // the dotted digit run is part of the email and must be consumed by
    // the email pass, not double-matched by IP/phone
    assert(r.getString(1) == "mail <EMAIL> then ip <IP> end")
    assert(r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(r.getLong(4) == 0 && r.getLong(5) == 0)
  }

  test("normalizeText: NFC composes, controls strip clean, whitespace collapses") {
    val d = docs(
      // DECOMPOSED e + combining acute; tab/newline runs; trailing space
      1L -> "cafe\u0301  du\tparc\n\nend ",
      // space-flanked BEL and C1 PU1 strip to ONE space each; the NUL
      // glued between words deletes without inserting a separator
      2L -> "bell \u0007 and\u0000glue \u009C end",
      3L -> "already clean")
    val out = Cleaning.normalizeText(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 == "caf\u00e9 du parc end")
    assert(out(1L)._2 == 16L) // n_chars counts the COMPOSED codepoints
    assert(out(2L)._1 == "bell andglue end")
    assert(out(3L)._1 == "already clean")
  }

  test("normalizeText: VT collapses to a space (explicit class, not dialect-split \\s)") {
    // Java's \s matches vertical tab but RE2's does not — the collapse
    // class is spelled [ \t\n\x0B\f\r]+ in BOTH dialects so a VT in
    // corpus text yields the same normal form (and hash key) in Spark
    // and the DuckDB oracle
    val d = docs(1L -> "a\u000Bb", 2L -> "x \u000B\t y", 3L -> "\u000Blead")
    val out = Cleaning.normalizeText(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b")
    assert(out(2L) == "x y")
    assert(out(3L) == "lead") // leading VT collapses then trims away
  }

  test("NfcNormalize: pure-ASCII fast path returns the input, zero copies") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("plain ascii stays put")
    assert(graft.functions.NfcNormalize.normalize(ascii) eq ascii)
    // non-ASCII but already NFC: one isNormalized probe, input returned
    val nfc = UTF8String.fromString("café")
    assert(graft.functions.NfcNormalize.normalize(nfc) eq nfc)
    // genuinely decomposed text still normalizes
    val dec = UTF8String.fromString("café")
    assert(graft.functions.NfcNormalize.normalize(dec).toString == "café")
  }

  test("normalizeText: NFC expression agrees across codegen and interpreted eval") {
    val d = docs(
      1L -> "plain ascii stays put",
      2L -> "compose e\u0301 and o\u0308 here",
      3L -> null.asInstanceOf[String])
    def rows() = d.select(col("doc_id"),
        graft.functions.NfcNormalizeExpr(col("text")).as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val byMode = Seq("CODEGEN_ONLY", "NO_CODEGEN").map { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try rows() finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(byMode.head == byMode.last)
    assert(byMode.head(1)._2 == "compose \u00e9 and \u00f6 here")
    assert(byMode.head(2)._2 == null) // null text stays null
  }

  test("dedupLinesInDoc: first occurrence wins, order kept, edge texts safe") {
    val d = docs(
      1L -> "nav\nbody one\nnav\nbody two\nnav",
      2L -> "only line",
      3L -> "",
      4L -> "a\n\nb\n\nc") // repeated EMPTY lines collapse too (documented)
    val out = Cleaning.dedupLinesInDoc(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("nav\nbody one\nbody two", 5L, 3L)))
    assert(out(2L) == (("only line", 1L, 1L)))
    assert(out(3L) == (("", 1L, 1L))) // empty text = one empty line
    assert(out(4L) == (("a\n\nb\nc", 5L, 4L)))
    // idempotent: a deduped doc passes through unchanged
    val once = Cleaning.dedupLinesInDoc(d)
      .select(col("doc_id"), col("text_dedup").as("text"))
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val twice = Cleaning.dedupLinesInDoc(once).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall { case (id, (t, _, _)) => twice(id) == t })
  }

  test("gopherRules: each rule gates independently; stats are exact") {
    val d = docs(
      1L -> "the quick brown fox jumps over a lazy dog today",  // passes all
      2L -> "the a",                                            // too few words
      3L -> "the 12 34 56 78 90 11 22 33 a",                    // alpha_frac 0.2
      4L -> "quick brown fox jumps over lazy dogs again today now", // 0 stop hits
      5L -> ("a aa the supercalifragilisticexpialidocious" +
        " pneumonoultramicroscopicsilicovolcanoconiosis"))      // mean len > 10
    val out = Cleaning.gopherRules(d, minWords = 3, maxWords = 100,
      stopwords = Seq("the", "a", "of", "and"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(5))
    assert(out(1L).getLong(1) == 10 && out(1L).getLong(4) == 2) // the, a
    assert(!out(2L).getBoolean(5) && out(2L).getLong(1) == 2)
    assert(!out(3L).getBoolean(5) && out(3L).getDouble(3) == 0.2)
    assert(!out(4L).getBoolean(5) && out(4L).getLong(4) == 0)
    assert(!out(5L).getBoolean(5) && out(5L).getDouble(2) > 10.0)
    // empty text: zero words, gated out, no division blowup
    val empty = Cleaning.gopherRules(docs(9L -> "  "), minWords = 1, maxWords = 10)
      .collect().head
    assert(empty.getLong(1) == 0 && !empty.getBoolean(5))
  }

  test("extractText: tags, script/style content, comments, entities, passthrough") {
    val d = docs(
      1L -> ("<html><head><script>var hidden = 'secret';</script>" +
        "<style>.x { display: none }</style></head><body>" +
        "<!-- menu markup --><h1>Real &amp; Title</h1>" +
        "<p>body   text</p><br><div>tail &lt;kept&gt;</div></body></html>"),
      2L -> "plain  prose   with    gaps",
      3L -> "&amp;lt;escaped&amp;gt;", // &amp; LAST: must NOT double-decode
      4L -> null.asInstanceOf[String])
    val out = Cleaning.extractText(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "Real & Title body text tail <kept>")
    assert(out(1L).getLong(2) ==
      d.filter(col("doc_id") === 1).head.getString(1).length -
        out(1L).getString(1).length)
    // script/style CONTENT dropped, not just the tags
    assert(!out(1L).getString(1).contains("secret"))
    assert(!out(1L).getString(1).contains("display"))
    // plain text: only whitespace normalization
    assert(out(2L).getString(1) == "plain prose with gaps")
    // escaped-entity text decodes ONE level (stays escaped-looking)
    assert(out(3L).getString(1) == "&lt;escaped&gt;")
    // null html -> null row values, row kept
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(2))
  }

  test("extractText: case-insensitive block tags, multiline blocks, attr tags") {
    val d = docs(
      1L -> "before <SCRIPT type=\"a\">\nline1\nline2\n</SCRIPT> after",
      2L -> "x <a href=\"http://e.com/?q=1&amp;r=2\">link text</a> y")
    val out = Cleaning.extractText(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "before after")
    // tag ATTRIBUTES stripped with the tag; entity inside prose decoded
    assert(out(2L).getString(1) == "x link text y")
  }
}
