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

  test("accumulated-corpus takedown: only touched epochs rewrite, the " +
      "Bloom forgets the fingerprints, re-submission is admitted, and " +
      "a second pass is a no-op") {
    import org.apache.spark.sql.functions.col
    val outDir = Files.createTempDirectory("dstd").toString
    def sink(rows: Seq[(Long, String)], epoch: Long) =
      DocStream.incrementalDedupSinkEachBatch(outDir)(
        rows.toDF("doc_id", "text"), epoch)
    sink(Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta"), 0L)
    sink(Seq(3L -> "eta theta iota", 4L -> "kappa lambda mu"), 1L)
    sink(Seq(5L -> "nu xi omicron"), 2L)
    def filesOf(e: Long) =
      Option(new java.io.File(s"$outDir/epoch=$e").listFiles()).toSeq
        .flatten.filter(_.isFile).map(f => (f.getName, f.length())).toSet
    val untouched0 = filesOf(0L)
    val report = DocStream.takedownAccumulated(spark, outDir, Seq(3L))
    assert(report == DocStream.TakedownReport(3L, 1L, 1L), s"$report")
    val left = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(left == Set(1L, 2L, 4L, 5L))
    assert(filesOf(0L) == untouched0,
      "an untouched epoch's files were rewritten")
    // the rolling Bloom was rebuilt from the survivors
    val in = new java.io.FileInputStream(s"$outDir/_bloom.bf")
    val bloom =
      try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
      finally in.close()
    val fp = graft.functions.TextFunctions.fingerprint(col("text"))
    val fpOf = Seq("eta theta iota", "alpha beta gamma")
      .map(t => t -> Seq(t).toDF("text").select(fp).head.getString(0))
      .toMap
    assert(!bloom.mightContainString(fpOf("eta theta iota")))
    assert(bloom.mightContainString(fpOf("alpha beta gamma")))
    // a re-submission of the erased CONTENT is admitted again — dedup
    // state must not remember what compliance removed
    sink(Seq(30L -> "eta theta iota"), 3L)
    assert(spark.read.parquet(outDir).where(col("doc_id") === 30L)
      .count() == 1L, "re-submitted content was wrongly deduped away")
    // …while still-present content stays deduped
    sink(Seq(31L -> "alpha beta gamma"), 4L)
    assert(spark.read.parquet(outDir).where(col("doc_id") === 31L)
      .count() == 0L)
    // idempotent
    val report2 = DocStream.takedownAccumulated(spark, outDir, Seq(3L))
    assert(report2.epochsRewritten == 0L && report2.rowsDeleted == 0L)
    // an epoch whose EVERY row is deleted is physically REMOVED — the
    // partition upsert never sees it (no surviving rows name it), so
    // the takedown must delete the directory itself or the erased
    // bytes silently survive
    val r3 = DocStream.takedownAccumulated(spark, outDir, Seq(5L))
    assert(r3.epochsRewritten == 1L && r3.rowsDeleted == 1L, s"$r3")
    assert(!new java.io.File(s"$outDir/epoch=2").exists(),
      "a fully-deleted epoch's directory survives on disk")
    assert(spark.read.parquet(outDir)
      .where(col("doc_id") === 5L).count() == 0L)
  }

  test("takedown sweeps the quarantine, recovers a crash before the " +
      "Bloom publish, and its discovery never scans untouched epochs " +
      "without a pushed filter") {
    import org.apache.spark.sql.functions.col
    val outDir = Files.createTempDirectory("dstd2").toString
    def sink(rows: Seq[(Long, String)], epoch: Long) =
      DocStream.incrementalDedupSinkEachBatch(outDir)(
        rows.toDF("doc_id", "text"), epoch)
    sink(Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta"), 0L)
    sink(Seq(3L -> "eta theta iota", 4L -> "kappa lambda mu"), 1L)
    // a HELD-BACK epoch in the sibling quarantine store carries the
    // taken-down doc too (the round-16 advice: readmitQuarantine could
    // otherwise reintroduce erased content)
    Seq(9L -> "held back erased bytes", 10L -> "held back survivor")
      .toDF("doc_id", "text")
      .write.parquet(s"$outDir.quarantine/epoch=7")
    Files.write(new java.io.File(s"$outDir.quarantine/epoch=7.REASON.txt")
      .toPath, "bounds breach\n".getBytes("UTF-8"))
    // scan audit: capture every file scan the takedown runs — scans
    // that cover the UNTOUCHED corpus epoch must either push the
    // doc_id In-filter down (the prune-first discovery) or read text
    // (the survivors-Bloom rebuild, O(survivors) by design); the old
    // full-corpus groupBy had neither
    val scans = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, String, String)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.executedPlan.foreach {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            scans.add((
              s.relation.location.rootPaths.map(_.toString).mkString(","),
              s.metadata.getOrElse("PushedFilters", ""),
              s.requiredSchema.fieldNames.mkString(",")))
          case _ => ()
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val report =
      try {
        val r = DocStream.takedownAccumulated(spark, outDir, Seq(3L, 9L))
        // the listener bus is async — wait for the capture to settle
        var last = -1
        var same = 0
        while (same < 3) {
          Thread.sleep(200)
          if (scans.size == last) same += 1 else { same = 0; last = scans.size }
        }
        r
      } finally spark.listenerManager.unregister(listener)
    assert(report.rowsDeleted == 1L && report.quarantineRowsDeleted == 1L,
      s"$report")
    val corpusBase = new java.io.File(outDir).getName
    import scala.jdk.CollectionConverters._
    val offenders = scans.asScala.filter { case (roots, pushed, schema) =>
      val coversUntouched = roots.split(",").exists { r =>
        !r.contains(".quarantine") && (r.stripSuffix("/").endsWith(corpusBase)
          || r.contains(s"$corpusBase/epoch=0"))
      }
      // schema-less scans are existence probes (isEmpty reads ≤ 1 row)
      coversUntouched && schema.nonEmpty && !pushed.contains("doc_id") &&
        !schema.split(",").contains("text")
    }
    assert(offenders.isEmpty,
      s"scans over the untouched epoch without pushed filter: $offenders")
    // quarantine: erased row gone, survivor + REASON kept
    assert(spark.read.parquet(s"$outDir.quarantine/epoch=7")
      .select("doc_id").as[Long].collect().toSet == Set(10L))
    assert(new java.io.File(s"$outDir.quarantine/epoch=7.REASON.txt")
      .exists())
    // a fully-swept quarantine epoch disappears with its sidecar
    Seq(11L -> "all of it erased").toDF("doc_id", "text")
      .write.parquet(s"$outDir.quarantine/epoch=8")
    Files.write(new java.io.File(s"$outDir.quarantine/epoch=8.REASON.txt")
      .toPath, "bounds breach\n".getBytes("UTF-8"))
    val r2 = DocStream.takedownAccumulated(spark, outDir, Seq(11L))
    assert(r2.quarantineRowsDeleted == 1L && r2.rowsDeleted == 0L, s"$r2")
    assert(!new java.io.File(s"$outDir.quarantine/epoch=8").exists())
    assert(!new java.io.File(s"$outDir.quarantine/epoch=8.REASON.txt")
      .exists())
    // crash before publishBloom: simulate the exact on-disk state — the
    // epoch rewrites landed (take 4 down cleanly), then the sketch is
    // rolled BACK to one still holding the erased fingerprint and the
    // pending marker is re-planted. A later pass that touches NOTHING
    // must still rebuild the sketch and clear the marker.
    val fp = graft.functions.TextFunctions.fingerprint(col("text"))
    def fpOf(t: String) =
      Seq(t).toDF("text").select(fp).head.getString(0)
    DocStream.takedownAccumulated(spark, outDir, Seq(4L))
    val stale = org.apache.spark.util.sketch.BloomFilter.create(1000L, 0.01)
    Seq("alpha beta gamma", "delta epsilon zeta", "eta theta iota",
      "kappa lambda mu").foreach(t => stale.putString(fpOf(t)))
    val out = new java.io.FileOutputStream(s"$outDir/_bloom.bf")
    try stale.writeTo(out) finally out.close()
    Files.write(new java.io.File(s"$outDir/_bloom.pending").toPath,
      "4".getBytes("UTF-8"))
    val r4 = DocStream.takedownAccumulated(spark, outDir, Seq(999L))
    assert(r4.epochsRewritten == 0L && r4.rowsDeleted == 0L, s"$r4")
    assert(!new java.io.File(s"$outDir/_bloom.pending").exists(),
      "the pending marker survived the recovery pass")
    val in2 = new java.io.FileInputStream(s"$outDir/_bloom.bf")
    val healed =
      try org.apache.spark.util.sketch.BloomFilter.readFrom(in2)
      finally in2.close()
    assert(!healed.mightContainString(fpOf("kappa lambda mu")),
      "the crashed takedown's erased fingerprint survived in the sketch")
    assert(healed.mightContainString(fpOf("alpha beta gamma")))
  }
}
