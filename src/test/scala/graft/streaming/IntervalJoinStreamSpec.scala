package graft.streaming

import graft.SparkSpec
import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming twin of the interval-overlap join (q141): the watermarked
  * stream-stream self-join pinned row-equal to the batch cell join
  * within the declared horizon, including a late-arrival drop and a
  * state-eviction assertion. */
class IntervalJoinStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // (custkey, orderkey, lo, hi) windows: several customers, overlapping
  // and disjoint windows, lengths ≤ 30 days
  private def fixture: Seq[(Long, Long, Long, Long)] = {
    val rnd = new scala.util.Random(23)
    (0L until 120L).map { i =>
      val lo = rnd.nextInt(300).toLong
      (i % 7, i, lo, lo + rnd.nextInt(30).toLong)
    }
  }

  private def batchPairs(rows: Seq[(Long, Long, Long, Long)])
      : Set[(Long, Long, Long, Long)] = {
    val w = rows.toDF("o_custkey", "orderkey", "lo", "hi")
    val a = w.select(col("o_custkey"), col("orderkey").as("a_orderkey"),
      col("lo").as("a_lo"), col("hi").as("a_hi"))
    val b = w.select(col("o_custkey"), col("orderkey").as("b_orderkey"),
      col("lo").as("b_lo"), col("hi").as("b_hi"))
    IntervalJoin.overlapJoin(a, b, Seq("o_custkey"),
      "a_lo", "a_hi", "b_lo", "b_hi", 16L)
      .where(col("a_orderkey") < col("b_orderkey"))
      .select(col("o_custkey"), col("a_orderkey"), col("b_orderkey"),
        (least(col("a_hi"), col("b_hi"))
          - greatest(col("a_lo"), col("b_lo")) + 1L).as("overlap_days"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("stream self-join matches the batch cell join row-for-row, " +
    "across micro-batch chunkings, with each pair emitted once") {
    for (chunk <- Seq(40, 1000)) {
      val mem = MemoryStream[(Long, Long, Long, Long)]
      val out = IntervalJoinStream.concurrentOrdersStream(
        mem.toDF().toDF("o_custkey", "orderkey", "lo", "hi"),
        maxLenDays = 30L, latenessDays = 1000L)
      val q = out.writeStream.format("memory")
        .queryName(s"ivjoin_$chunk").outputMode("append").start()
      fixture.grouped(chunk).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"ivjoin_$chunk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.length == got.toSet.size, "a pair was emitted twice")
      assert(got.toSet == batchPairs(fixture), s"chunk=$chunk")
    }
  }

  test("late arrival beyond the watermark is dropped loudly (counted), " +
    "and eviction keeps state bounded by the horizon, not the stream") {
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val out = IntervalJoinStream.concurrentOrdersStream(
      mem.toDF().toDF("o_custkey", "orderkey", "lo", "hi"),
      maxLenDays = 10L, latenessDays = 5L)
    val q = out.writeStream.format("memory")
      .queryName("ivjoin_late").outputMode("append").start()
    // batch 1: two overlapping windows around day 100
    mem.addData((1L, 1L, 100L, 105L), (1L, 2L, 103L, 110L))
    q.processAllAvailable()
    // batch 2: advance event time far ahead → watermark jumps past 100
    mem.addData((2L, 3L, 5000L, 5004L))
    q.processAllAvailable()
    mem.addData((2L, 4L, 5001L, 5002L))
    q.processAllAvailable()
    val before = spark.table("ivjoin_late").count()
    // batch 3: a THIRD window at day 100 — overlaps 1 and 2, but is
    // now later than the watermark allows: dropped, no new pairs
    mem.addData((1L, 5L, 101L, 104L))
    q.processAllAvailable()
    val after = spark.table("ivjoin_late").count()
    assert(after == before,
      "a watermark-late row produced pairs instead of dropping")
    val progress = q.recentProgress
    val dropped = progress.flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped > 0, "late row was not counted as watermark-dropped")
    // state eviction: rows from day ~100 cannot still be buffered
    // after the watermark reached day ~5000 — total state must be
    // bounded by the rows inside the final horizon, not all 5 rows
    // fed on each side
    val lastState = progress.last.stateOperators.map(_.numRowsTotal).sum
    assert(lastState < 10,
      s"state holds $lastState rows; horizon eviction is not working")
    q.stop()
    // the expected pairs DID appear before the late row: (1,2) and (3,4)
    assert(before == 2L, s"expected 2 pairs before the late row, got $before")
  }
}
