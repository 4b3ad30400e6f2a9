package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming erasure twin: stream-applied forget ≡ the batch
  * `forgetKeys` of the accumulated set, across a checkpoint restart
  * and a same-epoch replay (the SketchStream twin discipline). */
class ForgetStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("stream-applied erasure equals batch forgetKeys across a " +
      "checkpoint restart; replay and empty epochs are no-ops") {
    val stateDir = Files.createTempDirectory("fs_state").toString
    val ckpt = Files.createTempDirectory("fs_ckpt").toString
    val mem = MemoryStream[Long]
    def start() = mem.toDF().toDF("key")
      .writeStream
      .foreachBatch(ForgetStream.forgetSinkEachBatch(sf, stateDir) _)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val probes = Seq(7L, 13L, 29L, 42L, 133L)
    // epoch 1: forget 7 — the stream's verdict equals the batch one
    val q1 = start()
    mem.addData(7L); q1.processAllAvailable()
    assert(rows(ForgetStream.lookup(spark, sf, stateDir, probes)) ==
      rows(graft.operators.BloomSkip.forgetKeys(spark, sf, Seq(7L),
        probes.filterNot(_ == 7L))))
    q1.stop()
    // restart mid-queue: epoch 2 folds {13, 29} into the set
    val q2 = start()
    mem.addData(13L, 29L); q2.processAllAvailable()
    // an EMPTY epoch (no new keys) must not move anything
    mem.addData(13L); q2.processAllAvailable()
    q2.stop()
    assert(ForgetStream.accumulatedKeys(stateDir) == Seq(7L, 13L, 29L))
    val got = rows(ForgetStream.lookup(spark, sf, stateDir, probes))
    val want = rows(graft.operators.BloomSkip.forgetKeys(spark, sf,
      Seq(7L, 13L, 29L), Seq(42L, 133L)))
    assert(got == want && got.nonEmpty)
    // same-epoch replay (re-delivery of the whole last batch under a
    // direct call): the union is idempotent and the version memoized
    ForgetStream.forgetSinkEachBatch(sf, stateDir)(
      Seq(13L, 29L).toDF("key"), 99L)
    assert(rows(ForgetStream.lookup(spark, sf, stateDir, probes)) == want)
    // NULL keys are dropped, not folded
    ForgetStream.forgetSinkEachBatch(sf, stateDir)(
      Seq[Option[Long]](None).toDF("key"), 100L)
    assert(ForgetStream.accumulatedKeys(stateDir) == Seq(7L, 13L, 29L))
  }
}
