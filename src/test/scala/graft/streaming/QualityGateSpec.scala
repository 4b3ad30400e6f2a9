package graft.streaming

import graft.SparkSpec
import graft.operators.Checks
import graft.operators.Checks.Bound
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** The streaming quality circuit breaker: per-micro-batch declarative
  * metrics gate each epoch's publish — a corrupted batch is held back
  * whole with a loud reason, a clean one publishes, and replay
  * converges (round-13 verdict #5). */
class QualityGateSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val bounds = Seq(
    Bound("text_complete_ppm", 900000L, 1000000L),
    Bound("doc_id_unique_ppm", 1000000L, 1000000L),
    Bound("mean_text_len", 10L, 100000L))

  private def cleanDocs(from: Long, n: Long): Seq[(Long, String)] =
    (from until from + n).map(i =>
      (i, s"a perfectly reasonable document number $i with enough text"))

  test("clean batches publish, a corrupted batch is held back whole " +
    "with a loud reason, and the stream keeps going") {
    val outDir = Files.createTempDirectory("qgate").toString + "/corpus"
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(DocStream.qualityGateSinkEachBatch(outDir, bounds) _)
      .outputMode("append").start()
    mem.addData(cleanDocs(0, 50): _*); q.processAllAvailable()
    // 12 of 30 docs have null-ish text → text_complete_ppm = 600000
    val corrupt = cleanDocs(100, 18) ++ (200L until 212L).map(i => (i, ""))
    mem.addData(corrupt: _*); q.processAllAvailable()
    mem.addData(cleanDocs(300, 40): _*); q.processAllAvailable()
    q.stop()
    // corpus holds ONLY the clean epochs
    val corpus = spark.read.parquet(outDir)
    assert(corpus.count() == 90,
      s"corpus has ${corpus.count()} docs; quarantined rows leaked in")
    assert(!new java.io.File(s"$outDir/epoch=1").exists())
    // the held-back epoch sits in quarantine, data intact, reason loud
    val qdir = new java.io.File(s"$outDir.quarantine/epoch=1")
    assert(qdir.exists(), "corrupted epoch was not quarantined")
    assert(spark.read.parquet(qdir.getPath).count() == 30,
      "quarantine must hold the WHOLE batch")
    val reason = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"${qdir.getPath}.REASON.txt").toPath), "UTF-8")
    assert(reason.contains("text_complete_ppm") &&
      reason.contains("outside"), s"reason: $reason")
  }

  test("replay converges: same batch, same verdict, same partition — " +
    "and a loosened bound re-publishes a quarantined epoch cleanly") {
    val outDir = Files.createTempDirectory("qgate_rp").toString + "/corpus"
    val clean = cleanDocs(0, 20).toDF("doc_id", "text")
    val corrupt = (cleanDocs(50, 5) ++ (90L until 95L).map(i => (i, "")))
      .toDF("doc_id", "text")
    DocStream.qualityGateSinkEachBatch(outDir, bounds)(clean, 0L)
    DocStream.qualityGateSinkEachBatch(outDir, bounds)(corrupt, 1L)
    def corpusIds() = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val after = corpusIds()
    // replay BOTH epochs (crash-recovery): verdicts re-evaluate
    // identically, partitions overwrite, nothing moves
    DocStream.qualityGateSinkEachBatch(outDir, bounds)(clean, 0L)
    DocStream.qualityGateSinkEachBatch(outDir, bounds)(corrupt, 1L)
    assert(corpusIds() == after, "replay changed the published corpus")
    assert(new java.io.File(s"$outDir.quarantine/epoch=1").exists())
    // operator change between restarts: loosened bounds → the replayed
    // epoch publishes and its quarantine copy (and reason) are cleared
    val loose = Seq(Bound("text_complete_ppm", 100000L, 1000000L))
    DocStream.qualityGateSinkEachBatch(outDir, loose)(corrupt, 1L)
    assert(corpusIds().size == 30, "loosened replay did not publish")
    assert(!new java.io.File(s"$outDir.quarantine/epoch=1").exists(),
      "stale quarantine partition survived a clean publish")
    assert(!new java.io.File(s"$outDir.quarantine/epoch=1.REASON.txt")
      .exists(), "stale reason file survived")
  }

  test("readmitQuarantine: a committed quarantined epoch re-admits " +
    "under loosened bounds, the corpus equals the never-quarantined " +
    "run, a second pass is a no-op, and a still-bad epoch stays") {
    val outDir = Files.createTempDirectory("qgate_ra").toString + "/corpus"
    val clean = cleanDocs(0, 20).toDF("doc_id", "text")
    // epoch 1: borderline (would pass looser completeness bounds);
    // epoch 2: hopeless (duplicate ids — violates under ANY bounds here)
    val borderline = (cleanDocs(50, 15) ++ (90L until 95L).map(i => (i, "")))
      .toDF("doc_id", "text")
    val hopeless = (cleanDocs(600, 10) ++ cleanDocs(600, 10))
      .toDF("doc_id", "text")
    DocStream.qualityGateSinkEachBatch(outDir, bounds)(clean, 0L)
    DocStream.qualityGateSinkEachBatch(outDir, bounds)(borderline, 1L)
    DocStream.qualityGateSinkEachBatch(outDir, bounds)(hopeless, 2L)
    assert(new java.io.File(s"$outDir.quarantine/epoch=1").exists())
    assert(new java.io.File(s"$outDir.quarantine/epoch=2").exists())
    // the bounds loosen (completeness floor drops); uniqueness stays
    val loose = Seq(
      Bound("text_complete_ppm", 100000L, 1000000L),
      Bound("doc_id_unique_ppm", 1000000L, 1000000L))
    val r1 = DocStream.readmitQuarantine(spark, outDir, loose)
    assert(r1 == DocStream.ReadmitReport(2L, 1L, 1L), s"$r1")
    // the borderline epoch published into its own partition; the
    // corpus now equals a run where it was never quarantined
    def corpusIds() = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val neverDir = Files.createTempDirectory("qgate_nv").toString + "/corpus"
    DocStream.qualityGateSinkEachBatch(neverDir, loose)(clean, 0L)
    DocStream.qualityGateSinkEachBatch(neverDir, loose)(borderline, 1L)
    val never = spark.read.parquet(neverDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpusIds() == never,
      "readmitted corpus diverged from the never-quarantined run")
    assert(!new java.io.File(s"$outDir.quarantine/epoch=1").exists() &&
      !new java.io.File(s"$outDir.quarantine/epoch=1.REASON.txt").exists())
    // the hopeless epoch stays, reason refreshed to the CURRENT bounds
    val reason = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$outDir.quarantine/epoch=2.REASON.txt").toPath),
      "UTF-8")
    assert(reason.contains("doc_id_unique_ppm"), s"reason: $reason")
    // a second pass is a no-op
    val before = corpusIds()
    val r2 = DocStream.readmitQuarantine(spark, outDir, loose)
    assert(r2 == DocStream.ReadmitReport(1L, 0L, 1L), s"$r2")
    assert(corpusIds() == before, "an idempotent pass moved the corpus")
  }

  test("composed ingest: curate feeds the gate — a poisoned micro-batch " +
    "is quarantined while curated clean batches publish") {
    val outDir = Files.createTempDirectory("qgate_c").toString + "/corpus"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts = java.sql.Timestamp.valueOf("2024-01-15 10:00:00")
    val q = DocStream.curate(
      mem.toDF().toDF("doc_id", "text", "ts"), minQuality = 0.0)
      .select("doc_id", "text", "dt")
      .writeStream
      .foreachBatch(DocStream.qualityGateSinkEachBatch(outDir,
        Seq(Bound("doc_id_unique_ppm", 1000000L, 1000000L),
          Bound("mean_text_len", 30L, 100000L))) _)
      .outputMode("append").start()
    mem.addData(cleanDocs(0, 25).map { case (i, t) => (i, t, ts) }: _*)
    q.processAllAvailable()
    // a poisoned drop: DISTINCT texts (curate's fingerprint dedup must
    // not collapse them) that survive curation but sit far below the
    // declared mean-length floor
    mem.addData((100L until 120L).map(i => (i, s"tiny doc $i", ts)): _*)
    q.processAllAvailable()
    mem.addData(cleanDocs(300, 10).map { case (i, t) => (i, t, ts) }: _*)
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(outDir).count() == 35,
      "gate let a poisoned curated batch into the corpus")
    // stateful curation can interleave no-data batches, so the poisoned
    // epoch's id is discovered, not assumed
    val qdirs = Option(new java.io.File(s"$outDir.quarantine").listFiles())
      .toSeq.flatten.filter(f =>
        f.isDirectory && f.getName.startsWith("epoch="))
    assert(qdirs.size == 1, s"expected 1 quarantined epoch: $qdirs")
    assert(spark.read.parquet(qdirs.head.getPath).count() == 20)
    val reason = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"${qdirs.head.getPath}.REASON.txt").toPath), "UTF-8")
    assert(reason.contains("mean_text_len"), reason)
  }

  test("declared bounds on metrics the report lacks are violations, " +
    "not silent skips; empty batches gate nothing and publish nothing") {
    val df = cleanDocs(0, 3).toDF("doc_id", "text")
    val v = Checks.violations(Checks.docReport(df),
      Seq(Bound("rows", 1L, 10L), Bound("no_such_metric", 0L, 1L)))
    assert(v == Seq("no_such_metric: metric absent from report"))
    val outDir = Files.createTempDirectory("qgate_e").toString + "/corpus"
    DocStream.qualityGateSinkEachBatch(outDir, bounds)(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 0L)
    assert(!new java.io.File(outDir).exists() &&
      !new java.io.File(s"$outDir.quarantine").exists(),
      "an empty batch must publish nothing and quarantine nothing")
  }
}
