package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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

  /** One packed document: its block, token count, and the token-budget
    * bin it starts in (same encoding as the batch
    * [[graft.operators.Packing]]). */
  case class PackedDoc(doc_id: Long, block: Long, n_tokens: Long,
      start_tok: Long, bin: Long)

  /** STREAMING sequence packing — the batch operator's per-block token
    * prefix sum continued across micro-batches: each block keeps its
    * running token offset in keyed state, so a document arriving in
    * batch 50 lands exactly where a one-shot batch pack over the whole
    * history would have put it (given id-ordered arrival). This is the
    * continuous-ingestion shape of training-shard assembly: curate the
    * stream ([[curate]]), pack it, sink bins as shard files.
    *
    * State is ONE Long per block (`blocks`·8 bytes total — bounded by
    * construction, no watermark needed, NoTimeout is safe). Within a
    * batch, a block's rows are packed in doc_id order for determinism;
    * across batches, arrival order is append order — the streaming
    * contract (a late doc packs where it ARRIVES; offset packing never
    * reorders history, exactly like a real shard writer).
    *
    * Input must carry (doc_id, text). */
  def packStream(docs: DataFrame, budget: Int = 2048,
      blocks: Int = 8, salt: String = "pack"): Dataset[PackedDoc] = {
    import graft.operators.Packing.BinStride
    require(budget > 0 && blocks > 0, "budget and blocks must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        pmod(md5Long(concat(lit(s"$salt:"), col("doc_id").cast("string"))),
          lit(blocks.toLong)).as("block"))
      .as[(Long, Long, Long)]
      .groupByKey { case (_, _, block) => block }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (block: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[Long]) => {
          var offset = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (id, n, _) =>
            val start = offset
            offset += n
            PackedDoc(id, block, n, start, block * BinStride + start / budget)
          }
          state.update(offset)
          out.iterator
        })
  }
}
