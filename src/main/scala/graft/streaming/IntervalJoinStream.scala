package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of the interval-overlap join (q141,
  * [[graft.operators.IntervalJoin]]): Spark's native WATERMARKED
  * stream-stream join with a time-interval condition — the one shape
  * Structured Streaming plans with bounded state, because the
  * watermark plus a two-sided event-time disparity bound tells the
  * state store exactly when a buffered row can never match again and
  * is evicted (spec-pinned via the `stateOperators` metrics).
  *
  * Contract vs the batch operator: intervals are CLOSED integer
  * [lo, hi] ranges on a shared axis, and the stream join is pinned
  * row-equal to [[graft.operators.IntervalJoin.overlapJoin]] over the
  * same rows PROVIDED interval length ≤ `maxLen` and arrival lateness
  * ≤ `lateness` (both in axis units) — overlap of length-bounded
  * intervals implies |aLo − bLo| ≤ maxLen, so the disparity bound the
  * state store needs loses nothing within the declared horizon. That
  * horizon is the streaming tax the batch operator doesn't pay; in
  * exchange, state is O(rows inside the horizon) per key instead of
  * O(stream). Length/lateness breaches are the same class of contract
  * breach as any watermark: rows too late are DROPPED (counted in
  * `numRowsDroppedByWatermark`), never silently mis-joined.
  *
  * Scale shape at 100 TB: the join shuffles on the EQUI keys (the
  * keyed interval join is the production case — custkey here), so
  * state partitions by key exactly like the batch cell join's
  * (key, cell) shuffle; the event-time bound keeps each partition's
  * state window-bounded regardless of stream age. The batch side
  * stays the oracle surface (q141).
  */
object IntervalJoinStream {

  /** Generic watermarked overlap join. `left`/`right` are STREAMING
    * relations carrying integer interval columns (caller-prefixed,
    * non-colliding names) and the shared equi `keys`; the same
    * streaming DataFrame may be passed twice for a self-join. Event
    * time is derived from each interval's START (`lo · unitSeconds`
    * as an epoch timestamp). Emits each overlapping pair once, in
    * append mode, as soon as both rows have arrived. */
  def overlapStream(left: DataFrame, right: DataFrame, keys: Seq[String],
      lLo: String, lHi: String, rLo: String, rHi: String,
      maxLen: Long, lateness: Long, unitSeconds: Long): DataFrame = {
    require(maxLen >= 0 && lateness >= 0 && unitSeconds > 0,
      "maxLen/lateness must be >= 0, unitSeconds > 0")
    val delay = s"${lateness * unitSeconds} seconds"
    // event time = interval start, shifted ONE unit off the epoch
    // origin: Spark's watermark starts at 0, and the join's state
    // watermark treats rows at exactly t=0 as expired-on-arrival
    // (observed: axis value 0 was silently dropped in batch 0). The
    // shift is applied to BOTH sides, so disparity and lateness
    // semantics are untouched. Axis values must be >= 0 — a streaming
    // event time is a real timestamp by contract (the batch operator
    // keeps full negative-axis support).
    def side(df: DataFrame, lo: String, hi: String, ts: String) =
      df.where(col(lo) <= col(hi)) // invalid intervals drop, as in batch
        .withColumn(ts, timestamp_seconds((col(lo) + 1L) * unitSeconds))
        .withWatermark(ts, delay)
    val l = side(left, lLo, lHi, "_lts").alias("l")
    val r = side(right, rLo, rHi, "_rts").alias("r")
    // the closed-interval overlap, plus the two-sided event-time
    // disparity the state store needs for eviction: overlap of
    // length-≤-maxLen intervals implies the starts sit within maxLen
    // of each other, so the bound is semantics-free inside the horizon
    val horizon = expr(s"INTERVAL '${maxLen * unitSeconds}' SECOND")
    val cond = (keys.map(k => col(s"l.$k") === col(s"r.$k")) ++ Seq(
      col(s"l.$lLo") <= col(s"r.$rHi"),
      col(s"r.$rLo") <= col(s"l.$lHi"),
      col("r._rts") >= col("l._lts") - horizon,
      col("r._rts") <= col("l._lts") + horizon)).reduce(_ && _)
    val kCols = keys.map(k => col(s"l.$k").as(k))
    val lCols = left.columns.filterNot(keys.contains).map(c => col(s"l.$c"))
    val rCols = right.columns.filterNot(keys.contains).map(c => col(s"r.$c"))
    l.join(r, cond, "inner")
      .select(kCols ++ lCols ++ rCols: _*)
  }

  /** q141's streaming twin: concurrent orders per customer over a
    * stream of fulfillment windows `(o_custkey, orderkey, lo, hi)` in
    * epoch DAYS — the same relation
    * [[graft.operators.IntervalJoin.orderWindows]] builds in batch,
    * self-joined. `maxLenDays` declares the longest window the
    * contract covers (TPC-H fulfillment runs ≤ ~4 months; breaching
    * rows are length-violations, not data loss — they still join
    * within the bound, and only pairs whose starts sit further apart
    * than `maxLenDays` would be missed). Output matches batch q141's
    * (custkey, a_orderkey, b_orderkey, overlap_days) rows for all
    * pairs within the horizon. */
  def concurrentOrdersStream(windows: DataFrame, maxLenDays: Long,
      latenessDays: Long): DataFrame = {
    val a = windows.select(col("o_custkey"),
      col("orderkey").as("a_orderkey"),
      col("lo").as("a_lo"), col("hi").as("a_hi"))
    val b = windows.select(col("o_custkey"),
      col("orderkey").as("b_orderkey"),
      col("lo").as("b_lo"), col("hi").as("b_hi"))
    overlapStream(a, b, Seq("o_custkey"), "a_lo", "a_hi", "b_lo", "b_hi",
      maxLenDays, latenessDays, unitSeconds = 86400L)
      .where(col("a_orderkey") < col("b_orderkey"))
      .select(col("o_custkey"), col("a_orderkey"), col("b_orderkey"),
        (least(col("a_hi"), col("b_hi"))
          - greatest(col("a_lo"), col("b_lo")) + 1L).as("overlap_days"))
  }
}
