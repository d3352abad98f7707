package graft.queries

import graft.SparkSpec

/** Registry-wide physical-plan lint — the standing anti-pattern gate:
  * every declared query's executed plan is checked for the join shapes
  * that do not survive 100 TB. Complements the per-operator plan
  * asserts (BucketingSpec, PLANS.md) by covering every FUTURE query
  * automatically: a new operator that accidentally plans a cartesian
  * or an unhinted nested loop fails here, not in production.
  */
class PlanLintSpec extends SparkSpec {

  /** Queries whose plan legitimately contains a CONDITIONED
    * BroadcastNestedLoopJoin. Every entry's build side is a bounded
    * broadcast panel, never a data-sized relation:
    *  - sim_* top-k family: the ≤|query-ids| query-vector panel joined
    *    with a non-equi self-exclusion (`vec_id != query_id`) — the
    *    scored side streams, the panel is k rows;
    *  - range_join_windows: the fixture's 50-window generator crossing
    *    a ONE-ROW min/max bounds aggregate with the window index;
    *  - txt_vocab_overlap: the |sources|-row vocab-count panel crossed
    *    with itself under source_a < source_b — panel-sized both
    *    sides (broadcast asserted in the operator, r7 fix).
    * An UNCONDITIONED broadcast Cross (scalar totals) is allowed
    * structurally and needs no entry. */
  private val conditionedBnljAllowed: Set[String] = Set(
    "range_join_windows", "sim_hard_negatives", "sim_cosine_topk",
    "sim_truncated_topk", "sim_ivf_topk", "sim_kmeans_recall",
    "sim_quantized_recall", "sim_binary_hamming_topk", "sim_ivfpq_topk",
    "sim_ivfpq_search", "sim_ivfpq_refined_search", "sim_mmr_rerank",
    "txt_vocab_overlap",
    "sim_ivf_recall_clustered", "sim_ivfpq_recall_clustered",
    // the 3-row query-vector panel joined with the vec_id != qvid
    // self-exclusion (the bruteForceTopK panel shape, per-query pools)
    "sim_hybrid_rrf_panel")

  test("no CartesianProduct; nested loops only as scalar crosses or whitelisted bounded panels; plan shape matches the committed manifest") {
    val sf = "/root/testdata/sf0.001"
    val regen = """regen: sbt -batch "runMain graft.tools.PlanManifestGen""""
    val manifest = graft.util.PlanSig.read(graft.util.PlanSig.ManifestPath)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val seen = scala.collection.mutable.Set.empty[String]
    Registry.all.foreach { q =>
      // drain-executing queries are excluded (Registry.planExempt):
      // their final plan is a summary over a sink — nothing to lint
      if (!Registry.planExempt(q.name)) {
        seen += q.name
        val plan =
          try graft.util.PlanSig.planString(spark)(
            Registry.queries(q.name)(spark, sf))
          catch {
            case e: Throwable =>
              failures += s"${q.name}: plan build failed: ${e.getMessage}"
              ""
          }
        if (plan.contains("CartesianProduct"))
          failures += s"${q.name}: CartesianProduct"
        plan.linesIterator
          .filter(_.contains("BroadcastNestedLoopJoin"))
          .foreach { line =>
            // strip tree art AND the whole-stage-codegen "*(n) " marker —
            // present now that the lint plans with AQE off (PlanSig)
            val bare = line.replaceAll("""^[\s:+-]*(\*\(\d+\)\s*)?""", "").trim
            val isScalarCross = bare.matches(
              """BroadcastNestedLoopJoin Build(Left|Right), Cross""")
            if (!isScalarCross && !conditionedBnljAllowed(q.name))
              failures += s"${q.name}: unexpected nested loop: $bare"
          }
        // plan-SHAPE pin: an added exchange or a lost broadcast fails
        // HERE, not as bench drift adjudicated by a same-box A/B
        if (plan.nonEmpty) {
          val sig = graft.util.PlanSig.sigOf(plan)
          manifest.get(q.name) match {
            case None =>
              failures += s"${q.name}: not in plan_manifest.json ($regen)"
            case Some(want) if want != sig =>
              failures += s"${q.name}: plan shape drifted\n" +
                s"    manifest: $want\n    current:  $sig\n" +
                s"    (intentional? $regen and review the diff)"
            case _ => ()
          }
        }
      }
    }
    // a manifest entry whose query no longer exists is stale coverage
    (manifest.keySet -- seen).toSeq.sorted.foreach { n =>
      failures += s"$n: stale plan_manifest.json entry ($regen)"
    }
    assert(failures.isEmpty,
      s"plan lint failures:\n${failures.mkString("\n")}")
  }
}
