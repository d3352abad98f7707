package graft.tools

import graft.queries.Registry
import graft.util.PlanSig
import org.apache.spark.sql.SparkSession

/** Regenerates the committed plan-shape manifest (`plan_manifest.json`)
  * that PlanLintSpec pins every registry query against:
  *
  * {{{
  * sbt -batch "runMain graft.tools.PlanManifestGen"
  * }}}
  *
  * Run this ONLY after an intentional plan change, review the manifest
  * diff (it IS the plan-shape review: an added `ex=` is an added
  * shuffle, a `bhj`→`smj` flip is a lost broadcast), and commit it with
  * the change. Plans are built at sf0.001 — the same fixture the spec
  * uses — so the signatures are byte-comparable. */
object PlanManifestGen {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else PlanSig.ManifestPath
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // drain-executing queries (Registry.planExempt) have no static
    // plan to pin — same exclusion as PlanLintSpec
    val sigs = Registry.all.filterNot(q => Registry.planExempt(q.name)).map { q =>
      val sig = PlanSig.sigOf(
        PlanSig.planString(spark)(Registry.queries(q.name)(spark, sfDir)))
      println(s"[plan-manifest] ${q.name}: $sig")
      q.name -> sig
    }
    PlanSig.write(out, sigs)
    println(s"[plan-manifest] wrote ${sigs.size} signatures to $out")
    spark.stop()
  }
}
