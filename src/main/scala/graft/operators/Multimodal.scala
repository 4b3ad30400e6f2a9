package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One decoded media row: fixed-width feature vector + dims. */
case class MediaFeatures(doc_id: Long, media_type: String,
    n_bytes: Int, features: Array[Float])

/** Multimodal columns (north-star extension): image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The decode step is a clearly-marked STUB (`decodeBytesStub`): this
  * container has no image/audio codecs, so it derives deterministic fake
  * features from the raw bytes. Everything around it — the media table
  * schema, binary columns, batch shape (mapPartitions with an iterator,
  * the Scala twin of a pandas-batch UDF), partitioning, and the
  * frame-sampling/resize plumbing (pure codegen'd binary expressions) —
  * is real and tested, so swapping the stub for a JNI/codec call changes
  * one function.
  *
  * Scale notes: media bytes never shuffle — decode/resize/sample are
  * map-only over the scan; only extracted features (fixed-width) flow
  * into joins/aggregations downstream. That is the property that matters
  * at 100 TB: the big BLOB column stays columnar-pruned out of every
  * query that doesn't touch it.
  */
object Multimodal {

  /** Deterministic media table derived from `documents`: the text bytes
    * play the role of an opaque media payload; metadata is synthesized
    * from stable columns. (Binary content + typed metadata is the
    * schema pattern; the payload origin is irrelevant to the plumbing.) */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        col("source").as("origin")).as("meta"))

  /** Media metadata projection — the query path that must NOT read the
    * blob (column pruning keeps `content` out of the scan). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("media_type"),
      length(col("content")).cast("long").as("n_bytes"),
      col("meta.width").as("width"), col("meta.height").as("height"))
      .orderBy("doc_id")

  /** Resize-to-fixed-buffer: truncate-or-pad the payload to `n` bytes —
    * pure codegen'd binary expressions (no UDF), the plumbing shape of a
    * thumbnail/clip step. */
  def resized(media: DataFrame, n: Int = 64): DataFrame =
    media.withColumn("content_resized",
      substring(concat(col("content"), lit(Array.fill[Byte](n)(0))), 1, n))

  /** Frame-sample: cut the payload into `frames` fixed-stride slices
    * (video → frames; audio → windows) via posexplode + substring —
    * map-only, no UDF, one output row per frame. */
  def frameSample(media: DataFrame, frames: Int = 4,
      frameLen: Int = 16): DataFrame =
    media
      .select(col("doc_id"), col("media_type"), col("content"),
        posexplode(sequence(lit(0), lit(frames - 1))).as(Seq("frame_no", "off")))
      .select(col("doc_id"), col("media_type"), col("frame_no"),
        substring(col("content"), (col("off") * frameLen + 1).cast("int"),
          lit(frameLen)).as("frame"))
      .where(length(col("frame")) > 0)

  // ———————————————————————————————————————————————————————————————
  // STUB: media decode. Real deployments plug a codec (JNI, ffmpeg,
  // JPEG decoder) here; the container has none, so features are a
  // deterministic digest of the payload bytes. Signature and batch
  // shape (Iterator→Iterator over partitions) are the real contract.
  // ———————————————————————————————————————————————————————————————
  private[operators] def decodeBytesStub(bytes: Array[Byte],
      dim: Int): Array[Float] = {
    // accumulate in double, narrow at the end: float32 running sums are
    // order-sensitive enough to drift vs any reference computation
    val acc = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff) / 255.0
      i += 1
    }
    acc.map(_.toFloat)
  }

  /** Decode + feature-extract over the media table: per-partition
    * iterator processing (the Scala twin of a pandas-batch UDF — one
    * decoder instantiation per partition, streamed rows). */
  def decodeFeatures(spark: SparkSession, dir: String,
      dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec handle, model)
        it.map { case (id, mt, bytes) =>
          MediaFeatures(id, mt, bytes.length, decodeBytesStub(bytes, dim))
        }
      }
  }
}
