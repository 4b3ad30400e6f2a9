package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S2 offset-recovery semantics: the reference bootstraps Kafka offsets
  * from a Redis hash and commits them after the sink flush
  * (util/MyOffsetsUtils.scala:48-62, SURVEY §2.1 S2/S3). In Structured
  * Streaming the checkpoint IS that state: stop a query, append new
  * input, restart from the same checkpointLocation → already-committed
  * input is not reprocessed and new input is picked up exactly once.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("restart from checkpoint resumes after committed offsets") {
    val base = Files.createTempDirectory("cp_recovery").toString
    val srcDir = s"$base/src"; val outDir = s"$base/out"
    val cp = s"$base/_cp"
    new java.io.File(srcDir).mkdirs()

    import spark.implicits._
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "v").write.mode("overwrite").json(s"$srcDir/$name")

    val schema = "id LONG, v STRING"
    def startQuery() =
      spark.readStream.schema(schema).json(s"$srcDir/*/")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", cp)
        .start()

    writeBatch("b1", Seq((1L, "a"), (2L, "b")))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(outDir).count() == 2)

    // new data arrives while the query is down
    writeBatch("b2", Seq((3L, "c")))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(outDir).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    // b1 not reprocessed (no duplicates), b2 picked up
    assert(rows == Seq(1L, 2L, 3L))
  }

  test("packStream offsets survive a restart (state from the checkpoint)") {
    // the per-block running token offset is keyed state: stop the query,
    // feed more docs, restart from the same checkpoint → the new docs
    // continue at the offsets where the first run left off, matching the
    // one-shot batch pack over the full corpus
    val base = Files.createTempDirectory("cp_pack").toString
    val srcDir = s"$base/src"; val outDir = s"$base/out"
    val cp = s"$base/_cp"
    new java.io.File(srcDir).mkdirs()

    import spark.implicits._
    val texts = (0L until 16L).map(i =>
      (i, ("tok " * (3 + (i % 5).toInt)).trim))
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write.json(s"$srcDir/$name")

    val schema = "doc_id LONG, text STRING"
    def startQuery() =
      DocStream.packStream(
          spark.readStream.schema(schema).json(s"$srcDir/*/"),
          budget = 8, blocks = 2)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
          b.toDF().write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", cp)
        .outputMode("append")
        .start()

    writeBatch("b1", texts.take(8))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    writeBatch("b2", texts.drop(8)) // arrives while the query is down
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(outDir)
      .select("doc_id", "block", "n_tokens", "start_tok", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // equals the one-shot batch pack over the full corpus
    val dir = s"$base/batch"
    texts.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val expected = graft.operators.Packing
      .pack(spark, dir, budget = 8, blocks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected,
      s"restart broke offset continuity:\n missing=${expected -- got}\n extra=${got -- expected}")
  }
}
