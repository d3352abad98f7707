package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Executable form of CLAUDE.md's oracle-dialect trap list (VERDICT r9
  * §2): every `Registry` oracle SQL string is swept for the hazard
  * patterns that have ACTUALLY produced engine divergence in past
  * rounds. The PlanLintSpec precedent — a standing gate over every
  * present and future registry query beats a memory note.
  *
  * Rules (each names the round that burned us):
  *  - `\s` / `\S` regex classes — Java `\s` includes U+000B, RE2's
  *    does not (r9 driver drift). Pin `[ \t\n\x0B\f\r]` explicitly.
  *  - `regexp_replace` without the `'g'` flag — DuckDB default is
  *    first-match, Spark's is replace-all (r8).
  *  - `least(`/`greatest(` over a nullable column without `coalesce`
  *    in the same argument list — the engines disagree on null
  *    handling (r9 ADVICE, corpus_truncate_docs).
  *  - list comprehension with a filter (`[x FOR i IN r IF c]`) not
  *    wrapped in `coalesce` — zero matches yields NULL, not [] (r8).
  *  - `unnest([...])` over decimal literals without `::DOUBLE[]` —
  *    DuckDB numeric literals are DECIMAL (r8).
  *  - `round(CASE ...)` without `::DOUBLE` — same DECIMAL trap (r9).
  *  - nondeterministic functions (`random()`, `now()`,
  *    `current_timestamp`) — never valid in an oracled output.
  *  - a CTE referenced ≥ 3 times without `AS MATERIALIZED` — DuckDB
  *    inlines per REFERENCE, k^rounds expansion (dedup_kcore's 3^24
  *    file-handle explosion, r9).
  *
  * A finding is fatal unless (query, rule) is in the whitelist below
  * with a justification. */
class OracleLintSpec extends AnyFunSuite {

  /** (query name, rule) pairs audited by hand — each entry says WHY
    * the flagged text is safe. */
  private val whitelist: Map[(String, String), String] = Map(
    ("a6_histogram_buckets", "least-nullable") ->
      ("null value: both engines' least/greatest SKIP nulls (Spark Least " +
        "returns null iff all args null; DuckDB same) — a null value lands " +
        "in bucket 20 on both, and min/max aggregates skip nulls identically"),
    ("metrics_winsorized", "least-nullable") ->
      "CTE v filters value IS NOT NULL — clip args non-null by construction",
    ("metrics_winsorized", "greatest-nullable") ->
      "CTE v filters value IS NOT NULL — clip args non-null by construction",
    ("p16_filename_derivation", "replace-no-g") ->
      "$-anchored pattern (\\.pcap(ng)?$) — at most one match, g irrelevant",
    ("txt_readability", "replace-no-g") ->
      "$-anchored pattern ([.!?]+$) — at most one match, g irrelevant",
    ("corpus_chunk_sentences", "replace-no-g") ->
      "$-anchored pattern ([.!?]+$) — at most one match, g irrelevant",
    ("txt_burstiness", "replace-no-g") ->
      "$-anchored pattern ([.!?]+$) — at most one match, g irrelevant",
    ("txt_language_id", "greatest-nullable") ->
      ("every greatest arg derives from the SAME text column — they are " +
        "null together, and greatest(all-null) is NULL in both engines"),
    ("txt_winnowing_fingerprints", "greatest-nullable") ->
      ("greatest(length(text)-7, 0): both engines skip the null arg → " +
        "0 grams for null text on both sides"),
    ("dedup_winnow_pairs", "greatest-nullable") ->
      ("greatest(length(text)-7, 0): both engines skip the null arg → " +
        "0 grams for null text on both sides"),
    ("dedup_containment_pairs", "greatest-nullable") ->
      ("greatest(length(text)-7, 0): both engines skip the null arg → " +
        "0 grams for null text on both sides"),
    ("sim_mmr_rerank", "greatest-nullable") ->
      ("candidate pool filters null embeddings upstream (the r8 ADVICE " +
        "pcaTrain contract) — cosine args non-null by construction"),
    ("sim_kcenter_sample", "greatest-nullable") ->
      ("pool CTE filters null AND zero-magnitude embeddings — every " +
        "greatest arg is a finite cosine of non-null vectors")
  )

  /** Substring inside the balanced parens opening at `open` (the index
    * of '('); tolerant of quoted strings containing parens. */
  private def balancedArgs(s: String, open: Int): String = {
    var depth = 0; var i = open; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return s.substring(open + 1, i)
        case _ =>
      }
      i += 1
    }
    s.substring(open + 1) // unbalanced — return the tail, lint still sees it
  }

  private def occurrences(s: String, pat: String): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var i = s.indexOf(pat)
    while (i >= 0) { out += i; i = s.indexOf(pat, i + 1) }
    out.toSeq
  }

  /** Columns that are (or have historically become) nullable in the
    * driver's fixtures — the least/greatest hazard surface. */
  private val nullableCols = Seq("text", "value", "vec", "score", "lang")

  private def lint(name: String, sql: String): Seq[String] = {
    val f = scala.collection.mutable.ArrayBuffer[String]()
    val low = sql.toLowerCase

    // 1. bare perl whitespace classes (Java/RE2 \s divergence)
    if (sql.contains("\\s") || sql.contains("\\S"))
      f += "ws-class"

    // 2. regexp_replace without the 'g' flag
    for (i <- occurrences(low, "regexp_replace(")) {
      val args = balancedArgs(low, i + "regexp_replace".length)
      if (!args.replace(" ", "").endsWith(",'g'")) f += "replace-no-g"
    }

    // 3. least/greatest over a nullable column without coalesce
    for (fn <- Seq("least", "greatest"); i <- occurrences(low, fn + "(")) {
      // skip identifiers that merely END with the function name
      if (i == 0 || !Character.isLetterOrDigit(low.charAt(i - 1))) {
        val args = balancedArgs(low, i + fn.length)
        val touchesNullable = nullableCols.exists(c =>
          ("""(^|[^a-z0-9_])""" + c + """([^a-z0-9_]|$)""").r
            .findFirstIn(args).isDefined)
        if (touchesNullable && !args.contains("coalesce("))
          f += s"$fn-nullable"
      }
    }

    // 4. filtered list comprehension not wrapped in coalesce
    for (m <- """\[[^\[\]]{0,400}?\bfor\b[^\[\]]{0,400}?\bif\b""".r
           .findAllMatchIn(low)) {
      val pre = low.substring(math.max(0, m.start - 60), m.start)
      if (!pre.contains("coalesce(")) f += "list-comp-null"
    }

    // 5. unnest of a decimal-literal list without ::DOUBLE[]
    for (i <- occurrences(low, "unnest([")) {
      val args = balancedArgs(low, i + "unnest".length)
      val hasDecimalLit = """\d\.\d""".r.findFirstIn(args).isDefined
      if (hasDecimalLit && !args.contains("::double[]"))
        f += "unnest-decimal"
    }

    // 6. round(CASE ...) without ::DOUBLE (DECIMAL literal trap)
    for (i <- occurrences(low, "round(")) {
      if (i == 0 || !Character.isLetterOrDigit(low.charAt(i - 1))) {
        val args = balancedArgs(low, i + "round".length)
        if (args.trim.startsWith("case") && !args.contains("::double"))
          f += "round-case-decimal"
      }
    }

    // 7. nondeterministic functions
    for (bad <- Seq("random()", "now()", "current_timestamp"))
      if (low.contains(bad)) f += "nondeterministic"

    // 8. CTE referenced >= 3 times without AS MATERIALIZED
    for (m <- """(?s)\b([a-z_][a-z0-9_]*)\s+as\s+(materialized\s+)?\(""".r
           .findAllMatchIn(low)) {
      val cte = m.group(1)
      val materialized = m.group(2) != null
      if (!materialized && cte != "w") { // WINDOW w AS (...) is not a CTE
        val after = low.substring(m.end)
        val refs = ("""(^|[^a-z0-9_])""" + cte + """([^a-z0-9_.])""").r
          .findAllMatchIn(after).size
        if (refs >= 3) f += s"cte-inline-$cte"
      }
    }

    f.toSeq.distinct
  }

  test("every registry oracle passes the dialect-trap lint (explicit whitelist)") {
    val findings = for {
      q <- Registry.all
      sql <- q.oracle.toSeq
      rule <- lint(q.name, sql)
      if !whitelist.contains((q.name, rule))
    } yield s"${q.name}: $rule"
    assert(findings.isEmpty,
      s"\nOracle dialect-lint findings (fix or whitelist with justification):\n  " +
        findings.mkString("\n  "))
  }

  test("whitelist contains no stale entries") {
    val live = (for {
      q <- Registry.all
      sql <- q.oracle.toSeq
      rule <- lint(q.name, sql)
    } yield (q.name, rule)).toSet
    val stale = whitelist.keySet.diff(live)
    assert(stale.isEmpty, s"stale whitelist entries: $stale")
  }
}
