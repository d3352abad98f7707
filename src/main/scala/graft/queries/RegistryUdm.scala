package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry._

/** The `udm` domain of the query registry, split out of
  * [[Registry]] (round 13) purely for file size: shared table
  * loaders, fixtures and SQL helpers stay on [[Registry]], and
  * composition + the fail-loud duplicate-name gate are unchanged
  * in [[Registry.all]]. */
private[queries] object RegistryUdm {
  val defs: Seq[QueryDef] = Seq(
    QueryDef("udm_classify_pipeline",
      (s, d) => {
        // sort-before-transform: the global range sort runs on the cheap
        // 4-column scan (its sampling pass re-executes only that scan,
        // not the pipeline), and the narrow synth→parse→classify chain
        // preserves both intra-partition order and partition numbering —
        // so the output is globally ordered by event_id without a
        // post-transform sort that would double-execute the transform.
        // Explicit partition count: an orderBy exchange would be
        // AQE-coalesced to ~1 partition at this data size, serializing
        // the downstream CPU-dense transform.
        val sorted = t(s, d, "events")
          .repartitionByRange(s.sparkContext.defaultParallelism, col("event_id"))
          .sortWithinPartitions("event_id")
        val packets = SynthPackets.fromEvents(sorted, widen = false)
        val out = UdmTransform.transform(packets, "raw")
          .select(col("event_id"), col("event_struct.event").as("event"))
        out.select(col("event_id"),
            col("event.metadata.event_type").as("udm_type"),
            col("event.principal.port").cast("long").as("src_port"),
            try_element_at(col("event.about"), lit(1)).getField("hostname").as("about_host"))
        // deliberately NO trailing .orderBy: EliminateSorts would drop
        // the input-side local sort and keep a top-level global Sort
        // that buffers the whole transformed output (measured 2×). The
        // ordering contract is carried by construction — range
        // partitions + sorted input + narrow stages — and the driver's
        // order-sensitive compare (green at sf0.001/0.01/0.1) is the
        // enforcement. See CLAUDE.md invariant note.
      },
      // a NULL user_id renders as the string "null" in format_string,
      // so tcp/udp packets get srcport="null" → the int-cast error path
      // (P14 containment, UdmExpressions intCastError) → ERROR; signup
      // (ARP) has no tcp/udp layer, so it still classifies as ARP with
      // null port/host — the oracle mirrors both branches
      Some("""SELECT event_id,
        CASE WHEN user_id IS NULL AND event_type = 'signup' THEN 'NETWORK_ARP'
          WHEN user_id IS NULL THEN 'NETWORK_EVENT_ERROR'
          WHEN event_type = 'purchase' THEN 'NETWORK_SSL'
          WHEN event_type = 'view' THEN 'NETWORK_DNS'
          WHEN event_type = 'click' THEN 'NETWORK_HTTP'
          WHEN event_type = 'signup' THEN 'NETWORK_ARP'
          ELSE 'NETWORK_EVENT_ERROR' END AS udm_type,
        CASE WHEN event_type IN ('click', 'purchase') THEN 10000 + user_id
          WHEN event_type = 'view' THEN 20000 + user_id END AS src_port,
        CASE WHEN event_type = 'click' THEN 'host' || CAST(user_id AS VARCHAR) || '.example.com'
          WHEN event_type = 'view' THEN 'q' || CAST(user_id AS VARCHAR) || '.example.org'
          WHEN event_type = 'purchase' THEN 'sni' || CAST(user_id AS VARCHAR) || '.example.net'
          END AS about_host
        FROM events ORDER BY event_id"""), bench = true),

    QueryDef("udm_event_type_counts",
      (s, d) => {
        val packets = SynthPackets.fromEvents(t(s, d, "events"))
        UdmTransform.transform(packets, "raw")
          .select(col("event_struct.event").as("event"))
          .groupBy(col("event.metadata.event_type").as("udm_type"))
          .agg(count(lit(1)).as("n")).orderBy("udm_type")
      },
      Some("""SELECT CASE WHEN user_id IS NULL AND event_type = 'signup' THEN 'NETWORK_ARP'
          WHEN user_id IS NULL THEN 'NETWORK_EVENT_ERROR'
          WHEN event_type = 'purchase' THEN 'NETWORK_SSL'
          WHEN event_type = 'view' THEN 'NETWORK_DNS'
          WHEN event_type = 'click' THEN 'NETWORK_HTTP'
          WHEN event_type = 'signup' THEN 'NETWORK_ARP'
          ELSE 'NETWORK_EVENT_ERROR' END AS udm_type,
        count(*) AS n FROM events GROUP BY 1 ORDER BY udm_type""")))
}
