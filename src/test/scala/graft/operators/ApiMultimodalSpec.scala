package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Serving-API compositions (§2.7) and multimodal plumbing. */
class ApiMultimodalSpec extends SparkSpec {

  test("dauRealtime: full-outer hour alignment, no negative counts") {
    val rows = Api.dauRealtime(spark, sf, "2024-01-15").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).matches("\\d{2}"))
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
    }
  }

  test("statsByItem rejects unknown type param (F10 semantics)") {
    intercept[IllegalArgumentException] {
      Api.statsByItem(spark, sf, "small ring", "age-ish")
    }
  }

  test("detailByItem page carries the global total and highlights") {
    val rows = Api.detailByItem(spark, sf, "small ring", 1, 5).collect()
    assert(rows.length <= 5)
    val total = rows.head.getAs[Long]("total")
    assert(total > 0 && rows.forall(_.getAs[Long]("total") == total))
    assert(rows.forall(_.getAs[String]("sku_name").contains("<em>")))
  }

  test("media table: binary payload, pruned metadata path") {
    val meta = Multimodal.mediaMeta(spark, sf)
    // metadata query must not read the blob column
    val scanned = meta.queryExecution.executedPlan.toString()
    assert(!scanned.contains("content#") ||
      scanned.contains("ReadSchema"), "plan should prune the blob")
    val rows = meta.collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    assert(rows.forall(r => Set("image", "audio", "video")(r.getString(1))))
  }

  test("frameSample slices payloads map-only with correct lengths") {
    val frames = Multimodal.frameSample(
      Multimodal.mediaTable(spark, sf), frames = 4, frameLen = 16).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val b = r.getAs[Array[Byte]]("frame")
      assert(b.length > 0 && b.length <= 16)
    }
  }

  test("resized pads/truncates payloads to the fixed buffer size") {
    val r = Multimodal.resized(Multimodal.mediaTable(spark, sf), 64)
      .select(length(col("content_resized"))).distinct().collect()
    assert(r.map(_.getInt(0)).toSet == Set(64))
  }

  test("decodeFeatures: stub decode keeps schema + determinism") {
    val a = Multimodal.decodeFeatures(spark, sf, dim = 8).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val b = Multimodal.decodeFeatures(spark, sf, dim = 8).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b, "stub decode must be deterministic")
    assert(a.values.forall(_.length == 8))
  }

  // ——— q154: perceptual-hash near-dup ———————————————————————————

  /** Independent reference dHash straight from the payload bytes. */
  private def refDhash(text: String): Long = {
    val bytes = text.getBytes("UTF-8").padTo(Multimodal.DhashBytes, 0.toByte)
    (for { r <- 0 until 8; c <- 0 until 7 } yield {
      val a = bytes(r * 8 + c) & 0xff
      val b = bytes(r * 8 + c + 1) & 0xff
      if (a < b) 1L << (r * 7 + c) else 0L
    }).sum
  }

  test("q154 dhash signatures match the byte-level reference (incl. " +
    "zero-pad for short payloads)") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val sigs = Multimodal.dhashSignatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(sigs.nonEmpty && sigs.length == docs.size)
    sigs.foreach { case (id, h) =>
      assert(h == refDhash(docs(id)), s"doc $id hash mismatch")
    }
  }

  test("q154 media near-dup equals the brute-force cluster-pair scan " +
    "and never crosses media types") {
    val got = Multimodal.mediaNearDup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    graft.Caches.releaseAll()
    val sigs = Multimodal.dhashSignatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val clusters = sigs.groupBy(s => (s._2, s._3)).map {
      case ((mt, h), xs) => (mt, h, xs.map(_._1).min, xs.size.toLong)
    }.toSeq
    val dups = clusters.filter(_._4 > 1)
      .map(c => (c._1, c._3, c._3, 0L, c._4, c._4))
    val pairs = for {
      a <- clusters; b <- clusters
      if a._1 == b._1 && a._3 < b._3
      ham = java.lang.Long.bitCount(a._2 ^ b._2).toLong
      if ham <= 3
    } yield (a._1, a._3, b._3, ham, a._4, b._4)
    val brute = (dups ++ pairs).sortBy(t => (t._1, t._2, t._3))
    assert(got == brute && got.nonEmpty,
      s"got ${got.size} rows, brute ${brute.size}")
  }

  test("q154 plan: the payload bytes never shuffle — the dHash is " +
    "map-side, only (media_type, dhash) clusters cross the exchange") {
    val plan = Multimodal.mediaNearDup(spark, sf)
      .queryExecution.executedPlan.toString()
    graft.Caches.releaseAll()
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    assert(!exchanges.exists(l =>
      l.contains("content") || l.contains("text")),
      s"payload column crosses an exchange:\n${exchanges.mkString("\n")}")
  }
}
