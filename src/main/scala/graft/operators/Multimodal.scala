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

  // ——— perceptual-hash near-dup over the binary payload (q154) ———

  /** Thumbnail size the dHash reads: the [[resized]] 64-byte buffer —
    * the fixed-dimension normalization real image dHash gets from
    * resizing (hashing at length-scaled positions instead would shift
    * every sample under a one-byte edit; measured: the corpus's true
    * near-dups land at Hamming ≥ 11 that way, 1–3 this way). */
  val DhashBytes: Int = 64

  /** dHash width: an 8×8 byte grid, 7 adjacent-comparison bits per
    * row — 56 bits, sign-safe in a BIGINT on both engines. */
  val DhashBits: Int = 56

  /** The dHash as a SQL arithmetic string over a per-dialect byte
    * accessor — the [[Warehouse.zorderTermsSql]] discipline: one
    * generator feeds the engine AND the DuckDB oracle, so both
    * evaluate literally identical comparison/shift sums. `byteAt(pos)`
    * must yield the UNSIGNED value of the thumbnail's `pos`-th byte
    * (1-based), 0 past the end (the zero-pad of [[resized]]). Bit
    * (r, c) = 1 iff byte(r·8+c) < byte(r·8+c+1) — the gradient-sign
    * hash of Krawetz's dHash, over bytes instead of luminance. */
  def dhashTermsSql(byteAt: Int => String): String =
    (for { r <- 0 until 8; c <- 0 until 7 } yield {
      val w = 1L << (r * 7 + c)
      s"(CASE WHEN ${byteAt(r * 8 + c + 1)} < ${byteAt(r * 8 + c + 2)} " +
        s"THEN $w ELSE 0 END)"
    }).mkString(" + ")

  /** Engine-side byte accessor: true BINARY access over the resized
    * payload (one byte → hex pair → int; codegen'd, no UDF). */
  def byteAtSparkSql(colName: String)(pos: Int): String =
    s"CAST(conv(hex(substring($colName, $pos, 1)), 16, 10) AS BIGINT)"

  /** Oracle-side accessor (DuckDB): char access over the ASCII source
    * text — value-equal to the byte access for an ASCII payload
    * (ascii('') = 0 covers the zero-pad). */
  def byteAtDuckSql(colName: String)(pos: Int): String =
    s"ascii(substr($colName, $pos, 1))"

  /** Per-payload perceptual signatures: (doc_id, media_type, dhash).
    * Map-only over the blob scan — the hash is the ONLY thing that
    * flows downstream; the 100 TB property is that the bytes never
    * shuffle, exactly like [[decodeFeatures]]. */
  def dhashSignatures(spark: SparkSession, dir: String): DataFrame =
    dhashSignaturesOn(mediaTable(spark, dir))

  /** [[dhashSignatures]] over an explicit (doc_id, media_type,
    * content) relation — also the per-epoch projection of the
    * stream-maintained signature table
    * ([[graft.streaming.MediaStream]]): a signature is a PURE function
    * of the payload, so the stream and the batch share one generator
    * and cannot diverge. */
  def dhashSignaturesOn(media: DataFrame): DataFrame =
    resized(media, DhashBytes)
      .withColumn("dhash",
        expr(dhashTermsSql(byteAtSparkSql("content_resized"))))
      .select(col("doc_id"), col("media_type"), col("dhash"))

  /** q154: perceptual near-dup over the media table — dHash signatures
    * collapse to per-(media_type, hash) clusters, then the report a
    * media-dedup pass delivers: the EXACT-duplicate clusters (hamming
    * 0 — `id1 = id2` = the keeper, n* the member count) plus the
    * near-dup PAIRS from a banded Hamming join (the q45 skeleton via
    * [[Dedup.bandedHammingPairs]]: pigeonhole on `bands` equal
    * bit-bands, lossless for maxHamming < bands, exact popcount
    * verify). Pairs never cross media types (an image cannot near-dup
    * an audio clip). Output: (media_type, id1, id2, hamming, n1, n2),
    * id1 < id2 for pair rows. */
  def mediaNearDup(spark: SparkSession, dir: String, maxHamming: Int = 3,
      bands: Int = 4): DataFrame =
    mediaNearDupOn(dhashSignatures(spark, dir), maxHamming, bands)

  /** [[mediaNearDup]] over an explicit signature relation — also the
    * serving stage of the stream-maintained signature table. The
    * LOSSLESS-BAND guard lives here so every caller (batch query,
    * table read, HTTP request parameters) gets the same loud rejection:
    * with `bands` equal bit-bands, a pair within `maxHamming` is
    * GUARANTEED to collide on some band only while maxHamming < bands
    * (pigeonhole) — a request past that bound would silently drop true
    * pairs, so it is a 400, never a weaker answer. */
  def mediaNearDupOn(sigs: DataFrame, maxHamming: Int = 3,
      bands: Int = 4): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be >= 0")
    require(bands >= 1 && bands <= DhashBits,
      s"bands must be in 1..$DhashBits")
    require(maxHamming < bands,
      s"maxHamming ($maxHamming) must be < bands ($bands) — the " +
        "banded join is only lossless under the pigeonhole bound")
    // cache: the dup-cluster report and both band-join sides read it
    val clusters = graft.Caches.register(sigs
      .groupBy("media_type", "dhash")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_members"))
      .cache())
    val dups = clusters.where(col("n_members") > 1)
      .select(col("media_type"), col("keep_id").as("id1"),
        col("keep_id").as("id2"), lit(0L).as("hamming"),
        col("n_members").as("n1"), col("n_members").as("n2"))
    val pairs = Dedup.bandedHammingPairs(clusters, "dhash",
      Seq("media_type"), maxHamming, bands, DhashBits)
    dups.unionByName(pairs).orderBy("media_type", "id1", "id2")
  }
}
