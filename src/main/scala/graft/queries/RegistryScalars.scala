package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry._

/** The `scalars` domain of the query registry, split out of
  * [[Registry]] (round 13) purely for file size: shared table
  * loaders, fixtures and SQL helpers stay on [[Registry]], and
  * composition + the fail-loud duplicate-name gate are unchanged
  * in [[Registry.all]]. */
private[queries] object RegistryScalars {
  val defs: Seq[QueryDef] = Seq(
    QueryDef("p1_json_extract",
      (s, d) => t(s, d, "events").select(col("event_id"),
        get_json_object(col("props"), "$.k").try_cast("long").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events ORDER BY event_id""")),

    QueryDef("p3_timestamp_repair",
      (s, d) => t(s, d, "events").select(col("event_id"),
        unix_timestamp(graft.udm.UdmExpressions.robustTimestamp(
          concat(date_format(col("ts"), "MMM dd, yyyy HH:mm:ss"), lit(" UTC"))))
          .as("epoch_s"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
        CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s
        FROM events ORDER BY event_id""")),

    QueryDef("p4_classify_severity",
      (s, d) => t(s, d, "events").select(
          when(col("event_type") === "error", "high")
            .when(col("event_type").isin("purchase", "signup"), "medium")
            .otherwise("low").as("severity"))
        .groupBy("severity").agg(count(lit(1)).as("n")).orderBy("severity"),
      Some("""SELECT CASE WHEN event_type = 'error' THEN 'high'
          WHEN event_type IN ('purchase', 'signup') THEN 'medium'
          ELSE 'low' END AS severity, count(*) AS n
        FROM events GROUP BY 1 ORDER BY severity""")),

    QueryDef("p14_error_containment",
      (s, d) => t(s, d, "events").filter(col("event_type") === "error")
        .select(col("event_id"),
          lit("event processing failed").as("error_msg"),
          substring(col("props"), 1, 1000).as("snippet"))
        .orderBy("event_id"),
      Some("""SELECT event_id, 'event processing failed' AS error_msg,
        substr(props, 1, 1000) AS snippet
        FROM events WHERE event_type = 'error' ORDER BY event_id""")),

    QueryDef("p15_base64_roundtrip",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
          base64(encode(col("source"), "UTF-8")).as("b64"),
          decode(unbase64(base64(encode(col("source"), "UTF-8"))), "UTF-8").as("roundtrip"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, to_base64(encode(source)) AS b64,
        decode(from_base64(to_base64(encode(source)))) AS roundtrip
        FROM documents ORDER BY doc_id""")),

    QueryDef("p16_filename_derivation",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
          regexp_replace(concat(col("source"), lit(".pcapng")), "\\.pcap(ng)?$", ".udm.json")
            .as("udm_name"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        regexp_replace(source || '.pcapng', '\.pcap(ng)?$', '.udm.json') AS udm_name
        FROM documents ORDER BY doc_id""")),

    QueryDef("f1_filename_validation",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
          when(col("doc_id") % 50 === 0, concat(col("source"), lit("/evil")))
            .otherwise(col("source")).as("fname"))
        .select(col("doc_id"), col("fname"),
          graft.etl.BatchPipeline.isValidFilename(col("fname")).as("is_valid"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, fname,
        (length(fname) > 0 AND position('/' IN fname) = 0) AS is_valid
        FROM (SELECT doc_id, CASE WHEN doc_id % 50 = 0 THEN source || '/evil'
          ELSE source END AS fname FROM documents) ORDER BY doc_id""")))
}
