package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Streaming ingestion curation — the LLM-pipeline operators applied to
  * a document STREAM, i.e. the shape of continuous pretraining-data
  * ingestion (the batch twin is `operators.Curation`):
  *
  *  1. quality gate FIRST: map-only `qualityScore` filter (identical
  *     expression to the batch q20/q50 path) — junk never reaches the
  *     state store;
  *  2. exact dedup on the canonical fingerprint:
  *     `dropDuplicatesWithinWatermark` keyed on fp — state holds one
  *     compact row per distinct fingerprint inside the watermark horizon
  *     and EVICTS beyond it. Unbounded `dropDuplicates` state on a
  *     100 TB/day ingest is the classic OOM; the watermark bound is the
  *     standard continuous-ingestion contract. A document re-ingested
  *     AFTER the horizon re-emits: a dt-partitioned sink then stores it
  *     under the new day (duplicate across days), so when cross-horizon
  *     exactness matters, sink keyed on `fp` alone (the hash-bucket
  *     layout of [[DauStream.idempotentSinkEachBatch]] — drop `dt`
  *     before the sink) for global last-wins per fingerprint, or run
  *     the batch `operators.Curation` pass as periodic compaction;
  *  3. dt column for the partition-scoped sink
  *     ([[DauStream.idempotentSinkEachBatch]] / [[PartitionedUpsert]]).
  *
  * Input must carry (doc_id, text, ts event-time).
  */
object DocStream {

  def curate(docs: DataFrame, minQuality: Double = 0.5,
      watermark: String = "24 hours"): DataFrame =
    docs
      .withColumn("quality", qualityScore(col("text")))
      .where(col("quality") >= minQuality)
      .withColumn("fp", fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
}
