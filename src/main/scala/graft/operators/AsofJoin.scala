package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (point-in-time) join — the temporal lookup every feature /
  * training-data pipeline needs: for each left row, the latest right row
  * whose timestamp is ≤ the left row's, per key.
  *
  * Scale shape: NOT a θ-join (key = key AND r.ts <= l.ts would fan out
  * to every earlier right row and re-aggregate — O(|L|·|R|/keys) work).
  * Instead the two sides are tagged and UNIONED, and one running
  * `last(value, ignoreNulls)` window per key carries the most recent
  * right values forward onto subsequent left rows: exactly one shuffle
  * on the key, linear work, no fan-out — the same shape a stream-table
  * temporal join compiles to. Right rows sort before left rows at equal
  * timestamps, so a right row taking effect AT t is visible to a left
  * row at t (inclusive as-of, matching DuckDB's `ASOF JOIN ... ON l.ts
  * >= r.ts` which is the oracle).
  */
object AsofJoin {

  /** For each row of `left`, attach `valueCols` from the latest `right`
    * row with `right.ts <= left.ts` on the same `key` (null if none).
    * `right` must be unique per (key, ts) — pre-aggregate if not (the
    * window's ordering is only total under that contract); `valueCols`
    * must not collide with `left` columns. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String]): DataFrame =
    asofCore(left, right, key, ts, valueCols, keepTs = false)

  /** [[asof]] with a TOLERANCE: the match only counts if the right row
    * is within `toleranceSeconds` before the left row (the feature-store
    * contract "most recent reading, but not staler than X"). The matched
    * right timestamp rides in the carrier struct, so staleness is
    * decided per left row after the fill — same single-shuffle plan. */
  def asofTolerance(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCols: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    val withTs = asofCore(left, right, key, ts, valueCols, keepTs = true)
    // interval arithmetic (not epoch casts): works for TIMESTAMP and
    // TIMESTAMP_NTZ alike
    val stale = col("__rts").isNull ||
      col("__rts") < col(ts) - expr(s"INTERVAL $toleranceSeconds SECOND")
    valueCols.foldLeft(withTs) { (df, c) =>
        df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
      }
      .drop("__rts")
  }

  /** Core: as-of fill; with `keepTs` the matched right timestamp is also
    * surfaced as `__rts` (null if none) — the hook for tolerance
    * filtering (the plain path skips it so the shuffle doesn't carry a
    * dead timestamp copy). The values ride in ONE struct that is
    * non-null exactly on right rows: last(ignoreNulls) then tracks the
    * latest right ROW, so a legitimately-null value in that row stays
    * null instead of being resurrected from an older row (and
    * multi-column values can never mix rows). */
  private def asofCore(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCols: Seq[String], keepTs: Boolean): DataFrame = {
    val outCols = if (keepTs) "__rts" +: valueCols else valueCols
    val collisions = outCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"valueCols collide with left: $collisions")
    val structFields =
      if (keepTs) col(ts).as("__rts") +: valueCols.map(col)
      else valueCols.map(col)
    val l = left.withColumn("__side", lit(1))
    // a null right timestamp would sort FIRST in the window (asc = nulls
    // first) and fill every subsequent left row; SQL/DuckDB ASOF
    // semantics never match on a null timestamp — drop such rows. (A
    // null LEFT timestamp also sorts first, sees no fill, and comes back
    // unmatched — already the oracle's answer.)
    val r = right.where(col(ts).isNotNull).select(
      col(key), col(ts),
      struct(structFields: _*).as("__vals"),
      lit(0).as("__side"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("__vals",
      last(col("__vals"), ignoreNulls = true).over(w))
    // null keys never match: the window partitions null keys together, so
    // without the guard a null-key left row would be "filled" from a
    // null-key right row — SQL join semantics (and the DuckDB ASOF
    // oracle) say a null key matches nothing
    outCols.foldLeft(filled) { (df, c) =>
        df.withColumn(c,
          when(col(key).isNull, lit(null)).otherwise(col(s"__vals.$c")))
      }
      .where(col("__side") === 1)
      .drop("__side", "__vals")
  }

  /** Demonstration query: each event joined to the user's most recent
    * order at-or-before the event time (orders deduped to one row per
    * (customer, order date) — max orderkey wins, deterministically). */
  def eventsWithLastOrder(spark: SparkSession, dir: String): DataFrame =
    eventsOrdersDemo(spark, dir, asof(_, _, "user_id", "ts",
      Seq("last_order_key")))

  /** [[eventsWithLastOrder]] under a staleness bound: orders more than
    * `toleranceDays` before the event don't count. */
  def eventsWithRecentOrder(spark: SparkSession, dir: String,
      toleranceDays: Int = 30): DataFrame =
    eventsOrdersDemo(spark, dir, asofTolerance(_, _, "user_id", "ts",
      Seq("last_order_key"), toleranceSeconds = toleranceDays.toLong * 86400))

  /** Shared demo-query scaffolding: events as-of-joined to orders deduped
    * per (customer, order date) — max orderkey wins, deterministically. */
  private def eventsOrdersDemo(spark: SparkSession, dir: String,
      join: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val e = Tables.events(spark, dir).select("user_id", "event_id", "ts")
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("ts"))
      .agg(max("o_orderkey").as("last_order_key"))
    join(e, o)
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("last_order_key"))
      .orderBy("user_id", "event_id")
  }
}
