package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Stream-maintained PERCEPTUAL-SIGNATURE table (round-15 verdict #6):
  * media payloads arrive continuously, each epoch writes its docs'
  * dHash signatures as an `epoch=<id>` partition — the
  * [[SketchStream]] accumulated-sink shape applied to media dedup, so
  * `/mediaNearDup?source=sketch` answers from the signature table
  * (sketch-sized rows) without ever re-reading a payload byte.
  *
  * Replay safety at the ALGEBRA level, like the HLL sink: a signature
  * is a pure function of the payload, so a same-id replay overwrites
  * its own partition bit-equal, and a duplicate delivery under a NEW
  * epoch id adds only identical rows, which the serving read's
  * `distinct()` collapses — the near-dup report cannot move
  * (twin-pinned). Compaction folds committed epochs with the same
  * distinct. */
object MediaStream {

  private val Sub = "mediasigs"

  /** foreachBatch sink: per-epoch dHash partials. The batch must carry
    * (doc_id, media_type, content: binary); signatures come from the
    * SAME generator as the q154 batch query
    * ([[Multimodal.dhashSignaturesOn]]) — map-only, the payload bytes
    * never shuffle and never land in the table. */
  def dhashSinkEachBatch(outDir: String, compactEvery: Int = 0)
      (batch: DataFrame, epochId: Long): Unit = {
    Multimodal.dhashSignaturesOn(batch.where(col("content").isNotNull))
      .write.mode("overwrite").parquet(s"$outDir/$Sub/epoch=$epochId")
    if (compactEvery > 0 && epochId > 0L && epochId % compactEvery == 0L)
      graft.operators.Compact.compactAccumulated(batch.sparkSession,
        s"$outDir/$Sub", epochId, _.distinct())
  }

  /** The accumulated signature relation (distinct — see the replay
    * argument above). */
  def signatureTable(spark: SparkSession, outDir: String): DataFrame = {
    graft.operators.Compact.recoverAccumulated(s"$outDir/$Sub")
    spark.read.parquet(s"$outDir/$Sub")
      .select(col("doc_id"), col("media_type"), col("dhash"))
      .distinct()
  }

  /** q154 served from the TABLE: the identical cluster + banded-join
    * stage over the stream-maintained signatures — bit-equal to the
    * batch `mediaNearDup` over the same payloads (twin-pinned across
    * restart, replay, and duplicate delivery). */
  def mediaNearDupFromTable(spark: SparkSession, outDir: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    Multimodal.mediaNearDupOn(signatureTable(spark, outDir),
      maxHamming, bands)
}
