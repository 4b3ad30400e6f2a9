package graft.streaming

import graft.SparkSpec
import graft.operators.BloomSkip
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming twin of the Bloom skipping index (q148): the index
  * maintained incrementally by the ingest stream, lookups pinned equal
  * to the plain filter over everything streamed, across a checkpoint
  * restart, compaction, and a same-id replay. */
class BloomStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // 600 orders over 120 customers: a probe customer's ~5 orders spread
  // across epochs and files
  private def fixture: Seq[(Long, Long, Double)] =
    (0L until 600L).map(i => (i, (i * 31L) % 120L, i * 1.5 + 0.25))

  test("streamed bloom index: snapshot lookups equal the plain filter " +
    "across restart, compaction, and a same-id replay — and still prune") {
    val outDir = Files.createTempDirectory("bloom_stream").toString
    val ckpt = Files.createTempDirectory("bloom_stream_ckpt").toString
    val mem = MemoryStream[(Long, Long, Double)]
    def start() = mem.toDF()
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .writeStream
      .foreachBatch(BloomStream.sinkEachBatch(outDir, compactEvery = 2) _)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val chunks = fixture.grouped(100).toSeq
    val (h1, h2) = chunks.splitAt(3)
    val q1 = start()
    h1.foreach { c => mem.addData(c: _*); q1.processAllAvailable() }
    q1.stop()
    val q2 = start() // checkpoint restart mid-stream
    h2.foreach { c => mem.addData(c: _*); q2.processAllAvailable() }
    q2.stop()
    val keys = Seq(7L, 42L, 99L)
    def lookup() = BloomStream.snapshotLookup(spark, outDir, keys)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val want = fixture.filter(r => keys.contains(r._2)).sortBy(_._1)
    assert(lookup() == want && want.nonEmpty)
    // pruning is real: candidates are a strict subset of the stream's
    // files, and every file holding a probe row is a candidate
    val cands = BloomStream.snapshotCandidates(spark, outDir, keys).toSet
    val layout = spark.read.parquet(s"$outDir/bloomlayout")
    val allFiles = layout.select(col("file_id").cast("long"))
      .distinct().as[Long].collect().toSet
    val truth = layout.where(col("o_custkey").isin(keys: _*))
      .select(col("file_id").cast("long")).distinct()
      .as[Long].collect().toSet
    assert(truth.subsetOf(cands),
      s"false negative: ${truth -- cands} pruned")
    assert(cands.size < allFiles.size,
      s"no pruning: ${cands.size} of ${allFiles.size}")
    // compaction actually bounded the epoch directories
    for (d <- Seq("bloomlayout", "bloomidx")) {
      val dirs = new java.io.File(s"$outDir/$d").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("epoch="))
      assert(dirs < 5, s"$d: $dirs epoch dirs survived compactEvery=2")
    }
    // same-id replay of the last (in-flight) epoch: epoch-scoped file
    // ids + overwrite-own-partition converge to the same rows
    BloomStream.sinkEachBatch(outDir)(
      chunks.last.toDF("o_orderkey", "o_custkey", "o_totalprice"),
      chunks.size.toLong - 1L)
    assert(lookup() == want, "same-id replay changed the lookup answer")
    // an absent key finds nothing, through fp-bounded candidates
    assert(BloomStream.snapshotLookup(spark, outDir, Seq(10000000L))
      .count() == 0L)
    // the compacted base stays CLUSTERED by file_id inside each
    // written file (the row-group statistics the pruned scan skips
    // on) — an unsorted fold would smear every row group's min/max
    // across the whole id domain
    val byFile = spark.read.parquet(s"$outDir/bloomlayout/epoch=-1")
      .select(input_file_name().as("f"), col("file_id").cast("long"),
        monotonically_increasing_id().as("rid"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    byFile.foreach { case (f, rows) =>
      val inOrder = rows.sortBy(_._3).map(_._2).toSeq
      assert(inOrder == inOrder.sorted,
        s"compacted base $f is not clustered by file_id")
    }
  }
}
