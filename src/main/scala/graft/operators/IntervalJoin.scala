package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval-overlap join — the temporal join class Spark has no native
  * operator for (an inequality-only join condition planned naively
  * becomes a BroadcastNestedLoopJoin or a cartesian product, both
  * O(|L|·|R|) and both banned by this repo's plan audit). No reference
  * counterpart (north-star extension; [[AsofJoin]] covers the
  * point-lookup cousin).
  *
  * The scale shape is the classic CELL DECOMPOSITION (the bucketed
  * range-join pattern Databricks ships as `spark.databricks.optimizer.
  * rangeJoin.binSize`, here built from stock operators): each interval
  * explodes to the fixed-width cells it covers, the two sides meet in
  * an ordinary EQUI-join on (keys..., cell), the exact predicate
  * re-verifies overlap, and the pair deduplicates WITHOUT a distinct:
  * only the cell containing `greatest(aLo, bLo)` — the first cell the
  * two intervals share — emits the pair. Work is Σ cells-per-interval
  * + per-cell join density, never |L|·|R|; the join shuffles on an
  * equi-key Catalyst understands (AQE can rebalance hot cells), and a
  * `cellWidth` near the typical interval length keeps the explode
  * factor at ~2 rows per interval.
  *
  * Intervals are CLOSED ([lo, hi], touching endpoints overlap) on any
  * integer axis: cell assignment uses FLOOR division (the pmod form —
  * `(a - pmod(a, w)) div w`), so pre-epoch coordinates land in the
  * correct negative cells rather than aliasing around zero the way
  * truncate-toward-zero `div` would. Rows with lo > hi are dropped as
  * invalid (`sequence()` would reverse them). */
object IntervalJoin {

  /** Floor-division SQL for possibly-negative integer axes: Spark's
    * integer `div` truncates toward zero, which would merge cells −1
    * and 0; `pmod` is always non-negative, making this exact floor. */
  private def floorDiv(a: String, w: Long): String =
    s"(($a - pmod($a, $w)) div $w)"

  /** Generic cell-bucketed overlap join. `keys` are optional extra
    * equi-join columns (same names on both sides — a keyed interval
    * join is the common production case: device/user/customer + time
    * overlap); pass Nil for a pure temporal join. Column names of
    * `left`/`right` must not collide except for `keys` (callers
    * prefix). Output: every (left row × right row) pair that shares a
    * key and overlaps, once each. */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lLo: String, lHi: String, rLo: String, rHi: String,
      cellWidth: Long): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    def cells(df: DataFrame, lo: String, hi: String) =
      df.where(col(lo) <= col(hi))
        .withColumn("_cell", explode(expr(
          s"sequence(${floorDiv(lo, cellWidth)}, ${floorDiv(hi, cellWidth)})")))
    cells(left, lLo, lHi)
      .join(cells(right, rLo, rHi), keys :+ "_cell")
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      // exact dedup without a distinct: of all shared cells, only the
      // one holding the overlap's left edge emits the pair
      .where(col("_cell") ===
        expr(floorDiv(s"greatest($lLo, $rLo)", cellWidth)))
      .drop("_cell")
  }

  /** Fulfillment-window cell width: TPC-H order windows run up to ~4
    * months, so 128-day cells keep the explode factor ≤ 2. */
  val OrderCellDays: Long = 128L

  /** Each order's fulfillment window — order date to last ship date,
    * in epoch days, one keyed agg over orders⋈lineitem. The synthetic
    * generator does not honor TPC-H's ship-after-order rule, so the
    * endpoints are canonicalized (least/greatest) rather than assumed
    * ordered; the oracle applies the identical rule. */
  def orderWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_custkey", "o_orderdate")
      .agg(max(col("l_shipdate")).as("last_ship"))
      .select(col("o_orderkey"), col("o_custkey"),
        least(unix_date(col("o_orderdate").cast("date")),
          unix_date(col("last_ship").cast("date"))).cast("long").as("lo"),
        greatest(unix_date(col("o_orderdate").cast("date")),
          unix_date(col("last_ship").cast("date"))).cast("long").as("hi"))

  /** q141: concurrent orders per customer — pairs of the same
    * customer's orders whose fulfillment windows overlap, with the
    * overlap length. The interval self-join is keyed by customer AND
    * cell, so one hot customer with many in-flight orders shuffles as
    * (customer, cell) groups, not as one |orders(c)|² task; the window
    * relation is built once and cached (both join sides read it). */
  def concurrentOrders(spark: SparkSession, dir: String,
      cellDays: Long = OrderCellDays): DataFrame = {
    val ow = graft.Caches.register(orderWindows(spark, dir).cache())
    val a = ow.select(col("o_custkey"), col("o_orderkey").as("a_orderkey"),
      col("lo").as("a_lo"), col("hi").as("a_hi"))
    val b = ow.select(col("o_custkey"), col("o_orderkey").as("b_orderkey"),
      col("lo").as("b_lo"), col("hi").as("b_hi"))
    overlapJoin(a, b, Seq("o_custkey"), "a_lo", "a_hi", "b_lo", "b_hi",
      cellDays)
      .where(col("a_orderkey") < col("b_orderkey"))
      .select(col("o_custkey"), col("a_orderkey"), col("b_orderkey"),
        (least(col("a_hi"), col("b_hi"))
          - greatest(col("a_lo"), col("b_lo")) + 1L).as("overlap_days"))
      .orderBy("o_custkey", "a_orderkey", "b_orderkey")
  }
}
