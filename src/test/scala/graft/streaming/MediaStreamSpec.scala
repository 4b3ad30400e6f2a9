package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Stream-maintained dHash signature table: table-served near-dup ≡
  * the q154 batch report over the same payloads, across a checkpoint
  * restart, a same-id replay, and a duplicate delivery under a new
  * epoch id (the SketchStream twin discipline). */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def report(df: org.apache.spark.sql.DataFrame) = {
    val out = df.collect().map(_.toSeq).toSeq
    graft.Caches.releaseAll()
    out
  }

  test("table-served media near-dup is bit-equal to batch across " +
      "restart, replay, and duplicate delivery") {
    val outDir = Files.createTempDirectory("msig").toString
    val ckpt = Files.createTempDirectory("msig_ckpt").toString
    val fixture = graft.operators.Multimodal.mediaTable(spark, sf)
      .select("doc_id", "media_type", "content")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
      .toSeq
    val mem = MemoryStream[(Long, String, Array[Byte])]
    def start() = mem.toDF().toDF("doc_id", "media_type", "content")
      .writeStream
      .foreachBatch(MediaStream.dhashSinkEachBatch(outDir,
        compactEvery = 2) _)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val chunks = fixture.grouped(120).toSeq
    val (firstHalf, secondHalf) = chunks.splitAt(chunks.size / 2)
    val q1 = start()
    firstHalf.foreach { c => mem.addData(c: _*); q1.processAllAvailable() }
    q1.stop()
    val q2 = start() // checkpoint restart mid-stream
    secondHalf.foreach { c => mem.addData(c: _*); q2.processAllAvailable() }
    q2.stop()
    val want = report(graft.operators.Multimodal.mediaNearDup(spark, sf))
    assert(report(MediaStream.mediaNearDupFromTable(spark, outDir))
      == want && want.nonEmpty)
    // same-id replay: overwrite-own-partition converges
    val lastId = chunks.size.toLong - 1L
    MediaStream.dhashSinkEachBatch(outDir)(
      chunks.last.toDF("doc_id", "media_type", "content"), lastId)
    assert(report(MediaStream.mediaNearDupFromTable(spark, outDir))
      == want, "same-id replay moved the report")
    // duplicate delivery under a NEW epoch id: signatures are a pure
    // function of the payload, so the added rows are identical and
    // the serving distinct collapses them
    MediaStream.dhashSinkEachBatch(outDir)(
      chunks.head.toDF("doc_id", "media_type", "content"), lastId + 1L)
    assert(report(MediaStream.mediaNearDupFromTable(spark, outDir))
      == want, "duplicate delivery moved the report")
    // the payload bytes never land in the table
    val cols = spark.read.parquet(s"$outDir/mediasigs").columns.toSet
    assert(!cols.contains("content") && !cols.contains("content_resized"))
  }

  test("the lossless-band guard rejects maxHamming >= bands for every " +
      "caller") {
    intercept[IllegalArgumentException] {
      graft.operators.Multimodal.mediaNearDup(spark, sf,
        maxHamming = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Multimodal.mediaNearDup(spark, sf,
        maxHamming = 3, bands = 0)
    }
  }
}
