package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Streaming twin of the HLL distinct family (q137): O(m)-state
  * register maintenance pinned bit-equal to the batch sketch, across
  * micro-batch boundaries, duplicate deliveries, and a checkpoint
  * restart. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // overlapping user sets per type: the per-type sketches differ and the
  // merged union is not the sum of the parts
  private def fixture: Seq[(String, Long)] =
    (0L until 300L).map(u => ("view", u)) ++
      (150L until 500L).map(u => ("click", u)) ++
      (0L until 40L).map(u => ("buy", u * 7))

  private def runStream(chunks: Seq[Seq[(String, Long)]],
      checkpoint: Option[String] = None,
      acc: ConcurrentHashMap[String, Array[Int]] =
        new ConcurrentHashMap[String, Array[Int]](),
      emissions: AtomicInteger = new AtomicInteger())
      : (ConcurrentHashMap[String, Array[Int]], AtomicInteger) = {
    val mem = MemoryStream[(String, Long)]
    val base = mem.toDF().toDF("event_type", "user_id")
      .transform(SketchStream.hllUserStream(_).toDF())
      .writeStream.outputMode("update")
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach { r =>
          emissions.incrementAndGet()
          acc.put(r.getString(0), r.getSeq[Int](1).toArray)
        }
      }
    val q = checkpoint.fold(base)(c => base.option("checkpointLocation", c))
      .start()
    chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    q.stop()
    (acc, emissions)
  }

  private def latestDf(acc: ConcurrentHashMap[String, Array[Int]])
      : DataFrame = {
    import scala.jdk.CollectionConverters._
    acc.asScala.toSeq.map { case (t, r) => SketchStream.HllRegs(t, r) }
      .toDF()
  }

  private def batchRegs(ev: Seq[(String, Long)]): DataFrame =
    Sketches.hllRegisters(
      ev.toDF("event_type", "user_id")
        .select(col("event_type"), col("user_id").cast("string").as("uid")),
      Seq("event_type"), col("uid"))

  test("stream registers and estimates are bit-equal to the batch " +
    "sketch, whatever the micro-batch chunking") {
    for (chunk <- Seq(7, 113, 1000)) {
      val (acc, _) = runStream(fixture.grouped(chunk).toSeq)
      val got = SketchStream.snapshotRegisters(latestDf(acc))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      val want = batchRegs(fixture)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(got == want, s"chunk=$chunk")
      val gotEst = SketchStream.estimateSnapshot(latestDf(acc))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val wantEst = Sketches.hllEstimate(batchRegs(fixture),
          Seq("event_type"))
        .orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(gotEst == wantEst)
    }
  }

  test("duplicate delivery is absorbed silently: replaying every event " +
    "emits nothing and changes nothing") {
    val (acc, emissions) = runStream(Seq(fixture))
    val afterFirst = emissions.get()
    val snapBefore = SketchStream.snapshotRegisters(latestDf(acc))
      .collect().toSet
    // same events again, same accumulators: max-fold is idempotent, so
    // no register moves and the operator emits zero rows
    runStream(Seq(fixture, fixture), acc = acc, emissions = emissions)
    // the second run re-emits on ITS first batch (fresh state), but its
    // duplicate second batch must be silent
    val perBatch = emissions.get() - afterFirst
    assert(perBatch <= 3, s"duplicate batch emitted: $perBatch emissions")
    assert(SketchStream.snapshotRegisters(latestDf(acc)).collect().toSet
      == snapBefore)
  }

  test("histogram twin: epoch partials sum-merge to the batch " +
    "estimates, bit-equal, across compaction and a replayed epoch") {
    val outDir = Files.createTempDirectory("hist_stream").toString
    val rnd = new scala.util.Random(5)
    val types = Seq("view", "click", "buy")
    val fixture = (0 until 4000).map(i =>
      (types(rnd.nextInt(3)), rnd.nextDouble() * 120.0))
    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF().toDF("event_type", "value")
      .writeStream
      .foreachBatch(SketchStream.histSinkEachBatch(outDir,
        compactEvery = 2) _)
      .outputMode("append").start()
    fixture.grouped(700).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    def est(df: org.apache.spark.sql.DataFrame) = {
      val out = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
      graft.Caches.releaseAll()
      out
    }
    val got = est(SketchStream.quantileSnapshot(spark, outDir))
    val batch = fixture.toDF("event_type", "value")
    val want = est(graft.operators.Sketches.histQuantilesOn(batch)
      .select("event_type", "p50_est_micros", "p95_est_micros",
        "p99_est_micros"))
    assert(got == want && got.nonEmpty)
    // compaction actually bounded the partitions
    val dirs = new java.io.File(s"$outDir/hist").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(dirs < 6, s"$dirs epoch dirs survived compactEvery=2")
    // replay the LAST epoch (the only legitimately replayable one —
    // earlier epochs are already folded into the base): same id, same
    // rows → overwrite-own-partition, snapshot unchanged
    SketchStream.histSinkEachBatch(outDir)(
      fixture.drop(3500).toDF("event_type", "value"), 5L)
    assert(est(SketchStream.quantileSnapshot(spark, outDir)) == want,
      "replayed epoch changed the accumulated registers")
  }

  test("persisted HLL register sink: estimates served from the table " +
    "are bit-equal to batch, across a restart, compaction, a same-id " +
    "replay, AND a duplicate delivery under a new epoch id") {
    val outDir = Files.createTempDirectory("hll_sink").toString
    val ckpt = Files.createTempDirectory("hll_sink_ckpt").toString
    val mem = MemoryStream[(String, Long)]
    def start() = mem.toDF().toDF("event_type", "user_id")
      .writeStream
      .foreachBatch(SketchStream.hllSinkEachBatch(outDir,
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
    def served() = {
      val out = SketchStream.hllTableEstimates(spark, outDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      graft.Caches.releaseAll()
      out
    }
    val want = Sketches.hllEstimate(batchRegs(fixture), Seq("event_type"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(served() == want && want.nonEmpty)
    // compaction actually bounded the partitions
    val dirs = new java.io.File(s"$outDir/hllregs").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(dirs < 5, s"$dirs epoch dirs survived compactEvery=2")
    // same-id replay of the last epoch: overwrite-own-partition
    val lastId = chunks.size.toLong - 1L
    SketchStream.hllSinkEachBatch(outDir)(
      chunks.last.toDF("event_type", "user_id"), lastId)
    assert(served() == want, "same-id replay moved the registers")
    // duplicate delivery under a NEW epoch id: max is idempotent, so
    // the merged registers cannot move — the algebra-level immunity
    // the additive histogram sink does NOT have
    SketchStream.hllSinkEachBatch(outDir)(
      chunks.head.toDF("event_type", "user_id"), lastId + 1L)
    assert(served() == want, "new-id duplicate delivery changed estimates")
  }

  test("day-grain HLL sink: range estimates served from the table are " +
    "bit-equal to the batch range query, across a restart, compaction, " +
    "and a duplicate delivery under a new epoch id") {
    val outDir = Files.createTempDirectory("hlld_sink").toString
    val ckpt = Files.createTempDirectory("hlld_ckpt").toString
    // 3 days; day 2 overlaps day 1, day 3 disjoint — the range [d1, d2]
    // must exclude day 3's users through the register algebra
    val rows: Seq[(String, String, Long)] =
      (0L until 200L).map(u => ("view", "2024-01-01 09:00:00", u)) ++
      (100L until 300L).map(u => ("view", "2024-01-02 09:00:00", u)) ++
      (0L until 150L).map(u => ("click", "2024-01-02 12:00:00", u * 3)) ++
      (1000L until 1100L).map(u => ("view", "2024-01-03 09:00:00", u))
    val mem = MemoryStream[(String, String, Long)]
    def start() = mem.toDF().toDF("event_type", "tss", "user_id")
      .select(col("event_type"),
        org.apache.spark.sql.functions.to_timestamp(col("tss")).as("ts"),
        col("user_id"))
      .writeStream
      .foreachBatch(SketchStream.hllDailySinkEachBatch(outDir,
        compactEvery = 2) _)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val chunks = rows.grouped(130).toSeq
    val (h1, h2) = chunks.splitAt(chunks.size / 2)
    val q1 = start()
    h1.foreach { c => mem.addData(c: _*); q1.processAllAvailable() }
    q1.stop()
    val q2 = start() // checkpoint restart mid-stream
    h2.foreach { c => mem.addData(c: _*); q2.processAllAvailable() }
    q2.stop()
    def served() = SketchStream
      .hllRangeEstimates(spark, outDir, "2024-01-01", "2024-01-02")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batchEv = rows.toDF("event_type", "tss", "user_id")
      .select(col("event_type"),
        org.apache.spark.sql.functions.to_timestamp(col("tss")).as("ts"),
        col("user_id"))
    val want = Sketches
      .hllUsersRangeOn(batchEv, "2024-01-01", "2024-01-02")
      .select(col("event_type"), col("est_distinct"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.Caches.releaseAll()
    assert(served() == want && want.nonEmpty)
    val dirs = new java.io.File(s"$outDir/hllregsdaily").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(dirs < 5, s"$dirs epoch dirs survived compactEvery=2")
    // duplicate delivery under a NEW epoch id cannot move a max-merge
    SketchStream.hllDailySinkEachBatch(outDir)(
      chunks.head.toDF("event_type", "tss", "user_id")
        .select(col("event_type"),
          org.apache.spark.sql.functions.to_timestamp(col("tss")).as("ts"),
          col("user_id")),
      chunks.size.toLong)
    assert(served() == want, "new-id duplicate delivery moved the range")
  }

  test("persisted KMV sketch sink: estimates served from the table are " +
    "bit-equal to batch, across a restart, compaction, a same-id " +
    "replay, AND a duplicate delivery under a new epoch id") {
    val outDir = Files.createTempDirectory("kmv_sink").toString
    val ckpt = Files.createTempDirectory("kmv_sink_ckpt").toString
    val mem = MemoryStream[(String, Long)]
    def start() = mem.toDF().toDF("event_type", "user_id")
      .writeStream
      .foreachBatch(SketchStream.kmvSinkEachBatch(outDir,
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
    def served() = {
      val out = SketchStream.kmvTableEstimates(spark, outDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      graft.Caches.releaseAll()
      out
    }
    val want = Sketches.kmvEstimate(
      Sketches.kmvRegisters(
        fixture.toDF("event_type", "user_id")
          .select(col("event_type"),
            col("user_id").cast("string").as("uid")),
        "event_type", col("uid")),
      Seq("event_type"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(served() == want && want.nonEmpty)
    // the fixture exercises BOTH estimator regimes: 'buy' has 40 < k
    // distinct users (exact path), 'view'/'click' have > k (minima path)
    assert(want.exists(_._2 == 40L) &&
      want.exists { case (t, e) => t != "buy" && e > 64L })
    // compaction actually bounded the partitions
    val dirs = new java.io.File(s"$outDir/kmvregs").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(dirs < 5, s"$dirs epoch dirs survived compactEvery=2")
    // same-id replay of the last epoch: overwrite-own-partition
    val lastId = chunks.size.toLong - 1L
    SketchStream.kmvSinkEachBatch(outDir)(
      chunks.last.toDF("event_type", "user_id"), lastId)
    assert(served() == want, "same-id replay moved the sketch")
    // duplicate delivery under a NEW epoch id: min-k over sets is
    // idempotent like HLL's max — re-delivered hashes are already
    // members, so the merged sketch cannot move
    SketchStream.kmvSinkEachBatch(outDir)(
      chunks.head.toDF("event_type", "user_id"), lastId + 1L)
    assert(served() == want, "new-id duplicate delivery changed estimates")
    // set algebra over the persisted table: overlap estimates equal
    // the batch q147 estimate columns over the same events — computed
    // from stored minima, never rescanning the stream
    val ovGot = SketchStream.kmvTableOverlap(spark, outDir)
      .collect().map(_.toSeq).toSeq
    graft.Caches.releaseAll()
    val ovWant = Sketches.kmvOverlapOn(
        fixture.toDF("event_type", "user_id"))
      .select(col("type_a"), col("type_b"), col("union_est"),
        col("overlap_est"), col("jaccard_ppm"))
      .orderBy("type_a", "type_b")
      .collect().map(_.toSeq).toSeq
    graft.Caches.releaseAll()
    assert(ovGot == ovWant && ovGot.nonEmpty,
      "table-served overlap diverged from the batch estimates")
  }

  test("day-grain KMV sink (q156): range overlap served from the table " +
    "is bit-equal to the batch range query, across a restart, " +
    "compaction, and a duplicate delivery under a new epoch id") {
    val outDir = Files.createTempDirectory("kmvd_sink").toString
    val ckpt = Files.createTempDirectory("kmvd_ckpt").toString
    // 3 days, 2 types; view∩click is nonempty inside [d1, d2] and day
    // 3's users must be excluded by the day-grain algebra
    val rows: Seq[(String, String, Long)] =
      (0L until 200L).map(u => ("view", "2024-01-01 09:00:00", u)) ++
      (100L until 300L).map(u => ("view", "2024-01-02 09:00:00", u)) ++
      (0L until 150L).map(u => ("click", "2024-01-02 12:00:00", u * 3)) ++
      (1000L until 1100L).map(u => ("view", "2024-01-03 09:00:00", u)) ++
      (1000L until 1100L).map(u => ("click", "2024-01-03 10:00:00", u))
    def withTs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"),
        org.apache.spark.sql.functions.to_timestamp(col("tss")).as("ts"),
        col("user_id"))
    val mem = MemoryStream[(String, String, Long)]
    def start() = withTs(mem.toDF().toDF("event_type", "tss", "user_id"))
      .writeStream
      .foreachBatch(SketchStream.kmvDailySinkEachBatch(outDir,
        compactEvery = 2) _)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val chunks = rows.grouped(140).toSeq
    val (h1, h2) = chunks.splitAt(chunks.size / 2)
    val q1 = start()
    h1.foreach { c => mem.addData(c: _*); q1.processAllAvailable() }
    q1.stop()
    val q2 = start() // checkpoint restart mid-stream
    h2.foreach { c => mem.addData(c: _*); q2.processAllAvailable() }
    q2.stop()
    def served() = {
      val out = SketchStream
        .kmvTableRangeOverlap(spark, outDir, "2024-01-01", "2024-01-02")
        .collect().map(_.toSeq).toSeq
      graft.Caches.releaseAll()
      out
    }
    val want = Sketches
      .kmvOverlapRangeOn(withTs(rows.toDF("event_type", "tss", "user_id")),
        "2024-01-01", "2024-01-02")
      .select(col("type_a"), col("type_b"), col("union_est"),
        col("overlap_est"), col("jaccard_ppm"))
      .orderBy("type_a", "type_b")
      .collect().map(_.toSeq).toSeq
    graft.Caches.releaseAll()
    assert(served() == want && want.nonEmpty)
    // the range really intersects: view∩click inside [d1, d2] > 0
    assert(want.exists(r => r(3).asInstanceOf[Long] > 0L),
      s"fixture produced no overlap: $want")
    // compaction bounded the partitions
    val dirs = new java.io.File(s"$outDir/kmvregsdaily").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(dirs < 5, s"$dirs epoch dirs survived compactEvery=2")
    // duplicate delivery under a NEW epoch id: min-k over sets is
    // idempotent — the range sketch cannot move
    SketchStream.kmvDailySinkEachBatch(outDir)(
      withTs(chunks.head.toDF("event_type", "tss", "user_id")),
      chunks.size.toLong)
    assert(served() == want, "new-id duplicate delivery moved the range")
  }

  test("heavy-hitter twin: the snapshot re-ranks through the exact " +
    "threshold rule, row-equal to batch q139, across restart, " +
    "compaction, and a same-id replay") {
    val outDir = Files.createTempDirectory("hh_sink").toString
    val ckpt = Files.createTempDirectory("hh_ckpt").toString
    val rnd = new scala.util.Random(13)
    val data = Seq.fill(5000)((math.pow(rnd.nextDouble(), 2) * 60).toLong)
    val phiPpm = 20000L
    val mem = MemoryStream[Long]
    def start() = mem.toDF().toDF("item")
      .writeStream
      .foreachBatch(SketchStream.heavyHitterSinkEachBatch(outDir,
        compactEvery = 2) _)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val chunks = data.grouped(800).toSeq
    val (h1, h2) = chunks.splitAt(3)
    val q1 = start()
    h1.foreach { c => mem.addData(c: _*); q1.processAllAvailable() }
    q1.stop()
    val q2 = start() // checkpoint restart mid-stream
    h2.foreach { c => mem.addData(c: _*); q2.processAllAvailable() }
    q2.stop()
    def snap() = {
      val out = SketchStream.heavyHitterSnapshot(spark, outDir, phiPpm)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      graft.Caches.releaseAll()
      out
    }
    val want = Sketches.heavyHittersOn(
      spark.createDataset(data).toDF("item"), "item", phiPpm, k = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snap() == want && want.nonEmpty)
    val dirs = new java.io.File(s"$outDir/hhcounts").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(dirs < 6, s"$dirs epoch dirs survived compactEvery=2")
    // same-id replay of the last (in-flight) epoch converges
    SketchStream.heavyHitterSinkEachBatch(outDir)(
      chunks.last.toDF("item"), chunks.size.toLong - 1L)
    assert(snap() == want, "replayed epoch changed the exact counts")
  }

  test("cms sink: table-served frequencies are bit-equal to batch, " +
    "across a restart, compaction, and a same-id replay") {
    val outDir = Files.createTempDirectory("cms_sink").toString
    val ckpt = Files.createTempDirectory("cms_ckpt").toString
    val data = (0 until 4000).map(i => (i * 7919L) % 37L)
    val mem = MemoryStream[Long]
    def start() = mem.toDF().toDF("item")
      .writeStream
      .foreachBatch(SketchStream.cmsSinkEachBatch(outDir,
        compactEvery = 2) _)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val chunks = data.grouped(700).toSeq
    val (h1, h2) = chunks.splitAt(3)
    val q1 = start()
    h1.foreach { c => mem.addData(c: _*); q1.processAllAvailable() }
    q1.stop()
    val q2 = start() // checkpoint restart mid-stream
    h2.foreach { c => mem.addData(c: _*); q2.processAllAvailable() }
    q2.stop()
    val probes = data.distinct.sorted
    def served() = SketchStream.cmsTableEstimates(spark, outDir, probes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = {
      val regs = Sketches.cmsRegisters(
        spark.createDataset(data).toDF("item"), "item")
      Sketches.cmsEstimates(regs, probes.toDF("item"), "item")
        .orderBy("item")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(served() == want && want.nonEmpty)
    val dirs = new java.io.File(s"$outDir/cmsregs").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(dirs < 5, s"$dirs epoch dirs survived compactEvery=2")
    // same-id replay of the last (in-flight) epoch converges
    SketchStream.cmsSinkEachBatch(outDir)(
      chunks.last.toDF("item"), chunks.size.toLong - 1L)
    assert(served() == want, "replayed epoch changed the counters")
  }

  test("checkpoint restart resumes the registers: half before a stop, " +
    "half after, final state equals the one-shot batch sketch") {
    val ckpt = Files.createTempDirectory("hll_ckpt").toString
    val (a, b) = fixture.splitAt(fixture.size / 2)
    val acc = new ConcurrentHashMap[String, Array[Int]]()
    val mem = MemoryStream[(String, Long)]
    def start() = mem.toDF().toDF("event_type", "user_id")
      .transform(SketchStream.hllUserStream(_).toDF())
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach { r =>
          acc.put(r.getString(0), r.getSeq[Int](1).toArray)
        }
      }.start()
    val q1 = start()
    mem.addData(a: _*); q1.processAllAvailable(); q1.stop()
    val q2 = start()
    mem.addData(b: _*); q2.processAllAvailable(); q2.stop()
    val got = SketchStream.snapshotRegisters(latestDf(acc))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val want = batchRegs(fixture)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }
  test("rebuildUserSketches: after an upstream user erasure, every " +
    "user-keyed register table equals a warehouse fed only the " +
    "retained events; item-keyed tables are untouched") {
    import org.apache.spark.sql.functions.to_timestamp
    val outDir = Files.createTempDirectory("sk_rebuild").toString
    val golden = Files.createTempDirectory("sk_golden").toString
    val rows: Seq[(String, String, Long)] =
      (0L until 200L).map(u => ("view", "2024-01-01 09:00:00", u)) ++
      (100L until 300L).map(u => ("view", "2024-01-02 09:00:00", u)) ++
      (0L until 150L).map(u => ("click", "2024-01-02 12:00:00", u * 3))
    def df3(c: Seq[(String, String, Long)]) =
      c.toDF("event_type", "tss", "user_id")
        .select(col("event_type"), to_timestamp(col("tss")).as("ts"),
          col("user_id"))
    def feed(dir: String, data: Seq[(String, String, Long)]): Unit =
      data.grouped(130).zipWithIndex.foreach { case (c, i) =>
        SketchStream.hllSinkEachBatch(dir)(df3(c), i.toLong)
        SketchStream.hllDailySinkEachBatch(dir)(df3(c), i.toLong)
        SketchStream.kmvSinkEachBatch(dir)(df3(c), i.toLong)
        SketchStream.kmvDailySinkEachBatch(dir)(df3(c), i.toLong)
      }
    feed(outDir, rows)
    // an item-keyed table beside the user-keyed ones — must not move
    SketchStream.cmsSinkEachBatch(outDir)(
      Seq(1L, 2L, 2L, 3L).toDF("item"), 0L)
    def cmsFiles() = Option(new java.io.File(s"$outDir/cmsregs")
      .listFiles()).toSeq.flatten.flatMap(d =>
        Option(d.listFiles()).toSeq.flatten)
      .map(f => (f.getName, f.length())).toSet
    val cmsBefore = cmsFiles()
    // upstream erasure: users 0..49 are gone; the golden warehouse is
    // fed ONLY the retained events
    val retained = rows.filterNot(r => r._3 < 50L)
    feed(golden, retained)
    val rebuilt = SketchStream.rebuildUserSketches(spark, outDir,
      df3(retained))
    assert(rebuilt.toSet == Set("hllregs", "hllregsdaily", "kmvregs",
      "kmvregsdaily"))
    def rowsOf(df: DataFrame) = df.collect().map(_.toSeq).toSeq
    assert(rowsOf(SketchStream.hllTableEstimates(spark, outDir)) ==
      rowsOf(SketchStream.hllTableEstimates(spark, golden)))
    assert(rowsOf(SketchStream.hllRangeEstimates(spark, outDir,
        "2024-01-01", "2024-01-02")) ==
      rowsOf(SketchStream.hllRangeEstimates(spark, golden,
        "2024-01-01", "2024-01-02")))
    assert(rowsOf(SketchStream.kmvTableEstimates(spark, outDir)) ==
      rowsOf(SketchStream.kmvTableEstimates(spark, golden)))
    assert(rowsOf(SketchStream.kmvTableRangeOverlap(spark, outDir,
        "2024-01-01", "2024-01-02")) ==
      rowsOf(SketchStream.kmvTableRangeOverlap(spark, golden,
        "2024-01-01", "2024-01-02")))
    assert(cmsFiles() == cmsBefore,
      "the item-keyed table moved under a USER erasure rebuild")
    // idempotent: a second rebuild from the same upstream is bit-equal
    val again = SketchStream.rebuildUserSketches(spark, outDir,
      df3(retained))
    assert(again == rebuilt)
    assert(rowsOf(SketchStream.hllTableEstimates(spark, outDir)) ==
      rowsOf(SketchStream.hllTableEstimates(spark, golden)))
  }
}
