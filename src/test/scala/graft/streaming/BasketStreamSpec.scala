package graft.streaming

import graft.SparkSpec
import graft.operators.Sessionize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming twin of the market-basket family (q132): per-user
  * stateful new-item extraction + accumulated pairs + the shared
  * batch re-rank, pinned bit-equal to the batch operator on the
  * streamed event set. */
class BasketStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // deterministic engagement fixture: 12 users over 9 items, with one
  // power user (uid 99) touching every item — the cap case
  private def fixture: Seq[BasketEvent] =
    (for {
      u <- 1L to 12L
      j <- 0 until (3 + (u % 5)).toInt
    } yield BasketEvent(u, ((u * 3 + j * j) % 9) + 1)) ++
      (1L to 9L).map(k => BasketEvent(99L, k))

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] = {
    val out = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    graft.Caches.releaseAll()
    out
  }

  private val Cap = 6 // uid 99's 9 items cross it; everyone else is under

  test("lift snapshot matches the batch operator bit-for-bit; " +
      "the power user is dropped by both; replayed epoch converges") {
    val outDir = Files.createTempDirectory("basket_stream").toString
    val mem = MemoryStream[BasketEvent]
    val q = mem.toDS()
      .transform(BasketStream.basketDeltaStream(_, maxBasket = Cap))
      .writeStream
      .foreachBatch(BasketStream.basketSinkEachBatch(outDir) _)
      .outputMode("append").start()
    fixture.grouped(17).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()

    val want = rows(Sessionize.basketLiftOn(
      fixture.toDF("user_id", "k"), minCount = 1L, topK = 1000,
      maxBasket = Cap))
    val got = rows(BasketStream.liftSnapshot(spark, outDir,
      minCount = 1L, topK = 1000, maxBasket = Cap))
    assert(got == want && got.nonEmpty, s"got $got want $want")
    // the power user contributed at most Cap+1 accumulated rows
    val uid99 = spark.read.parquet(s"$outDir/pairs")
      .where($"user_id" === 99L).count()
    assert(uid99 == Cap + 1, s"state did not swallow past cap+1: $uid99")

    // replay: same epoch id, same deltas → overwrite-own-partition
    BasketStream.basketSinkEachBatch(outDir)(
      Seq(BasketEvent(7L, 1L)).toDS(), 55L)
    val once = rows(BasketStream.liftSnapshot(spark, outDir,
      minCount = 1L, topK = 1000, maxBasket = Cap))
    BasketStream.basketSinkEachBatch(outDir)(
      Seq(BasketEvent(7L, 1L)).toDS(), 55L)
    val twice = rows(BasketStream.liftSnapshot(spark, outDir,
      minCount = 1L, topK = 1000, maxBasket = Cap))
    assert(once == twice, "epoch replay changed the accumulated pairs")
  }

  test("compaction bounds the pairs partitions; lift snapshot " +
      "bit-equal; replay straddling a compaction converges") {
    val outDir = Files.createTempDirectory("basket_compact").toString
    val mem = MemoryStream[BasketEvent]
    val q = mem.toDS()
      .transform(BasketStream.basketDeltaStream(_, maxBasket = Cap))
      .writeStream
      .foreachBatch(BasketStream.basketSinkEachBatch(outDir,
        compactEvery = 3) _)
      .outputMode("append").start()
    fixture.grouped(9).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    val parts = new java.io.File(s"$outDir/pairs").list()
      .filter(_.startsWith("epoch=")).toSeq.sorted
    assert(parts.contains("epoch=-1") && parts.size <= 4,
      s"pairs partitions not compacted: $parts")
    // the compacted pair set answers bit-equal to the batch operator
    val want = rows(Sessionize.basketLiftOn(
      fixture.map(e => (e.user_id, e.k)).toDF("user_id", "k"),
      minCount = 1L, topK = 1000, maxBasket = Cap))
    assert(rows(BasketStream.liftSnapshot(spark, outDir,
      minCount = 1L, topK = 1000, maxBasket = Cap)) == want)
    // crash-replay straddling a compaction: epoch 9 triggers the fold
    BasketStream.basketSinkEachBatch(outDir, compactEvery = 3)(
      Seq(BasketEvent(7L, 1L)).toDS(), 9L)
    val once = rows(BasketStream.liftSnapshot(spark, outDir,
      minCount = 1L, topK = 1000, maxBasket = Cap))
    BasketStream.basketSinkEachBatch(outDir, compactEvery = 3)(
      Seq(BasketEvent(7L, 1L)).toDS(), 9L)
    val twice = rows(BasketStream.liftSnapshot(spark, outDir,
      minCount = 1L, topK = 1000, maxBasket = Cap))
    assert(once == twice, "replay across a compaction changed the lift")
  }

  test("user erasure: rebuildRetained rebuilds the pair store from the " +
      "retained events — the lift equals batch over retained, the " +
      "erased user leaves no row, a golden stream agrees, idempotent") {
    val outDir = Files.createTempDirectory("basket_rebuild").toString
    val golden = Files.createTempDirectory("basket_golden").toString
    // raw-event wrapper: the rebuild consumes the raw relation (ts /
    // event_id order is its determinism contract)
    def rawDf(evs: Seq[BasketEvent]): DataFrame =
      evs.zipWithIndex.map { case (e, i) =>
        (e.user_id, 1704067200000000L + i * 60000000L, i.toLong,
          s"""{"k":${e.k}}""")
      }.toDF("user_id", "ts_us", "event_id", "props")
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("event_id"), col("props"))
    def stream(dir: String, evs: Seq[BasketEvent]): Unit = {
      val mem = MemoryStream[BasketEvent]
      val q = mem.toDS()
        .transform(BasketStream.basketDeltaStream(_, maxBasket = Cap))
        .writeStream
        .foreachBatch(BasketStream.basketSinkEachBatch(dir) _)
        .outputMode("append").start()
      evs.grouped(17).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      q.stop()
    }
    stream(outDir, fixture)
    // erase the power user (99): their pairs are user-keyed personal data
    val retained = fixture.filterNot(_.user_id == 99L)
    BasketStream.rebuildRetained(spark, outDir, rawDf(retained),
      maxBasket = Cap)
    // on-disk sweep: no erased-user row anywhere in the store
    assert(spark.read.parquet(s"$outDir/pairs")
      .where($"user_id" === 99L).count() == 0L)
    // the lift equals the batch operator over the retained events
    assert(rows(BasketStream.liftSnapshot(spark, outDir,
        minCount = 1L, topK = 1000, maxBasket = Cap)) ==
      rows(Sessionize.basketLiftOn(retained.toDF("user_id", "k"),
        minCount = 1L, topK = 1000, maxBasket = Cap)))
    // golden twin: a stream that never saw the user agrees — on the
    // lift AND on per-user pair counts (the cap discipline)
    stream(golden, retained)
    def countsOf(dir: String) =
      spark.read.parquet(s"$dir/pairs").groupBy("user_id").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(BasketStream.liftSnapshot(spark, outDir,
        minCount = 1L, topK = 1000, maxBasket = Cap)) ==
      rows(BasketStream.liftSnapshot(spark, golden,
        minCount = 1L, topK = 1000, maxBasket = Cap)))
    assert(countsOf(outDir) == countsOf(golden),
      "per-user pair counts diverge from the never-saw-the-user stream")
    // idempotent
    BasketStream.rebuildRetained(spark, outDir, rawDf(retained),
      maxBasket = Cap)
    assert(countsOf(outDir) == countsOf(golden))
  }

  test("cross-batch dedup: a pair seen in an earlier batch is not re-emitted") {
    val outDir = Files.createTempDirectory("basket_dedup").toString
    val mem = MemoryStream[BasketEvent]
    val q = mem.toDS()
      .transform(BasketStream.basketDeltaStream(_, maxBasket = Cap))
      .writeStream
      .foreachBatch(BasketStream.basketSinkEachBatch(outDir) _)
      .outputMode("append").start()
    mem.addData(BasketEvent(1L, 5L), BasketEvent(1L, 6L))
    q.processAllAvailable()
    mem.addData(BasketEvent(1L, 5L), BasketEvent(1L, 7L)) // 5 is old news
    q.processAllAvailable()
    q.stop()
    val pairs = spark.read.parquet(s"$outDir/pairs")
      .select("user_id", "k").as[(Long, Long)].collect().sorted.toSeq
    assert(pairs == Seq((1L, 5L), (1L, 6L), (1L, 7L)), s"got $pairs")
  }

  test("the accumulation survives a restart from its checkpoint") {
    val base = Files.createTempDirectory("basket_cp").toString
    val srcDir = s"$base/src"; val outDir = s"$base/out"; val cp = s"$base/_cp"
    new java.io.File(srcDir).mkdirs()
    def writeBatch(name: String, ev: Seq[BasketEvent]): Unit =
      ev.toDF("user_id", "k").write.json(s"$srcDir/$name")
    def startQuery() =
      spark.readStream.schema("user_id LONG, k LONG").json(s"$srcDir/*/")
        .as[BasketEvent]
        .transform(BasketStream.basketDeltaStream(_, maxBasket = Cap))
        .writeStream
        .foreachBatch(BasketStream.basketSinkEachBatch(outDir) _)
        .option("checkpointLocation", cp)
        .outputMode("append").start()

    val (first, rest) = fixture.splitAt(20)
    writeBatch("b1", first)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    writeBatch("b2", rest) // arrives while the query is down
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    assert(rows(BasketStream.liftSnapshot(spark, outDir,
        minCount = 1L, topK = 1000, maxBasket = Cap)) ==
      rows(Sessionize.basketLiftOn(fixture.toDF("user_id", "k"),
        minCount = 1L, topK = 1000, maxBasket = Cap)))
  }
}
