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
}
