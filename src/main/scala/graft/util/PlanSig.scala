package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executed-plan SHAPE signature for the registry-wide plan manifest.
  *
  * Why this exists: a plan regression that adds an Exchange or demotes a
  * broadcast join to a sort-merge join used to surface only as bench
  * drift, which then cost a same-box A/B session to adjudicate
  * (BENCH_AB_r08.md and every round since). Pinning the per-query STATIC
  * plan shape as a committed manifest turns that adjudication into a CI
  * diff: PlanLintSpec fails the moment a query's shuffle count, join
  * strategy mix, or pushed-filter coverage changes, with a one-line
  * regeneration tool ([[graft.tools.PlanManifestGen]]) for intentional
  * changes.
  *
  * The signature counts physical node KINDS, not plan text: shuffle
  * exchanges (`ex`), broadcast exchanges (`bx`), reused exchanges
  * (`reuse`), the four join strategies (`bhj`/`smj`/`shj`/`bnlj`),
  * cartesian products (`cart`), parquet file scans (`scan`) and how many
  * of those scans carry a non-empty PushedFilters list (`pushed`).
  * Counts are stable across master/parallelism/partition settings —
  * they depend only on the logical plan, the optimizer, and file-size
  * stats of the pinned sf0.001 fixture — which is what makes them
  * committable.
  */
object PlanSig {

  /** Repo-relative manifest location (committed). */
  final val ManifestPath = "plan_manifest.json"

  /** Build a query's physical-plan string under pinned planning confs:
    *  - AQE OFF — the STATIC plan is the CI-pinnable artifact; AQE's
    *    runtime re-plans are data-dependent and belong to execution,
    *    not to the committed shape;
    *  - untruncated scan metadata — the default
    *    `spark.sql.maxMetadataStringLength`=100 truncates FileScan
    *    lines mid-`PushedFilters`, which would make `pushed` counts
    *    depend on column-name lengths;
    *  - cache cleared first — a previous query's `persist` would
    *    otherwise swap a FileScan for an InMemoryTableScan via the
    *    plan-cache, making signatures order-dependent across the
    *    registry sweep.
    * Confs are restored afterwards (the session is shared). */
  def planString(spark: SparkSession)(build: => DataFrame): String = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val meta = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try build.queryExecution.executedPlan.toString
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.maxMetadataStringLength", meta)
    }
  }

  // node name = first alpha token after tree art ("+- ", ": ") and the
  // whole-stage-codegen marker ("*(3) ")
  private val nodeRe = """^[\s:+-]*(?:\*\(\d+\)\s*)?([A-Za-z]+)""".r

  /** Signature of one plan string, e.g.
    * `"ex=3 bx=1 reuse=0 bhj=1 smj=0 shj=0 bnlj=0 cart=0 scan=2 pushed=1"`. */
  def sigOf(plan: String): String = {
    var ex, bx, reuse, bhj, smj, shj, bnlj, cart, scan, pushed = 0
    plan.linesIterator.foreach { line =>
      nodeRe.findFirstMatchIn(line).map(_.group(1)).foreach {
        case "Exchange"                => ex += 1
        case "BroadcastExchange"       => bx += 1
        case "ReusedExchange"          => reuse += 1
        case "BroadcastHashJoin"       => bhj += 1
        case "SortMergeJoin"           => smj += 1
        case "ShuffledHashJoin"        => shj += 1
        case "BroadcastNestedLoopJoin" => bnlj += 1
        case "CartesianProduct"        => cart += 1
        case "FileScan" =>
          scan += 1
          if (line.contains("PushedFilters: [") &&
              !line.contains("PushedFilters: []")) pushed += 1
        case _ => ()
      }
    }
    s"ex=$ex bx=$bx reuse=$reuse bhj=$bhj smj=$smj shj=$shj " +
      s"bnlj=$bnlj cart=$cart scan=$scan pushed=$pushed"
  }

  /** Write the manifest (sorted by query name — diffs stay minimal). */
  def write(path: String, sigs: Seq[(String, String)]): Unit = {
    val body = sigs.sortBy(_._1)
      .map { case (n, s) => s"""  "$n": "$s"""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path), body.getBytes("UTF-8"))
  }

  /** Read a manifest written by [[write]] (names and signatures are
    * quote-free identifiers — the fixed format needs no JSON library).
    * FAIL-LOUD parse: a malformed line or a duplicated query name
    * (bad merge, hand edit) would otherwise lint against the wrong
    * pin via silent skip/last-wins — the Registry duplicate-name
    * lesson applied to the manifest. */
  def read(path: String): Map[String, String] = {
    val lineRe = """\s*"([^"]+)":\s*"([^"]+)",?\s*""".r
    val pairs = scala.io.Source.fromFile(path, "UTF-8").getLines()
      .filterNot(l => l.trim == "{" || l.trim == "}" || l.trim.isEmpty)
      .map {
        case lineRe(n, s) => n -> s
        case bad => throw new IllegalStateException(
          s"$path: malformed manifest line: '$bad'")
      }.toSeq
    val dups = pairs.groupBy(_._1).collect { case (n, ps) if ps.size > 1 => n }
    require(dups.isEmpty, s"$path: duplicate manifest entries: ${dups.mkString(", ")}")
    pairs.toMap
  }
}
