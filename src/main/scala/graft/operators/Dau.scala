package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Daily-active-user pipeline — the batch re-expression of the reference's
  * `dwd_DauApp` (see /root/reference SparkSreaming_realtime .../app/dwd_DauApp.scala:40-204):
  * per-day distinct on a device/user key (J5), date/hour derivation (F1/F2),
  * then the serving aggregations A1 (total) and A2 (by-hour) that the
  * reference delegated to Elasticsearch.
  *
  * Scale notes: the dedup is a single hash-aggregate shuffle on
  * (user_id, dt) — Spark does map-side partial distinct first, so the
  * shuffle carries at most one row per (user, day, partition). The by-hour
  * variant uses a window only to pick the *first* event per (user, day)
  * (reference keeps the first occurrence's attributes); partitioned by the
  * same key it rides the same shuffle. No driver-side state, no collect.
  */
object Dau {

  /** Events with derived dt/hr columns (F1/F2: epoch → 'yyyy-MM-dd', 'HH'). */
  def withDay(events: DataFrame): DataFrame =
    events
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("hr", date_format(col("ts"), "HH"))

  /** A1: distinct active users per day. */
  def dauTotal(spark: SparkSession, dir: String): DataFrame = {
    val e = withDay(Tables.events(spark, dir))
    e.select("dt", "user_id")
      .dropDuplicates("dt", "user_id") // J5: per-day distinct
      .groupBy("dt")
      .agg(count(lit(1)).as("dau"))
      .orderBy("dt")
  }

  /** A2: first-visit hour per user per day, counted by (dt, hr).
    * The reference keeps the FIRST occurrence of a mid per day
    * (Redis SADD returns 1 only once, dwd_DauApp.scala:101-108); the
    * deterministic order here is (ts, event_id).
    */
  def dauByHour(spark: SparkSession, dir: String): DataFrame = {
    val e = withDay(Tables.events(spark, dir))
    val w = Window.partitionBy("dt", "user_id").orderBy(col("ts"), col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy("dt", "hr")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("dt", "hr")
  }

  /** F11 + A2 composition (`/dauRealtime` day-over-day): daily DAU with the
    * previous CALENDAR day's value alongside (0 when there was none) — the
    * reference compares today vs yesterday by date, not by previous row.
    *
    * Single-pass shape: each deduped (dt, user) row emits itself
    * `(dt, td=1, yd=0)` plus a next-calendar-day shadow
    * `(dt+1, td=0, yd=1)` — map-side, BEFORE the daily aggregation — so
    * `dau = sum(td)` and `dau_yd = sum(yd)` fold in the ONE aggregation
    * the plain DAU count already needs. A day that exists only as a
    * shadow (the day after the last active day) drops out via `dau > 0`
    * (a real day always has dau ≥ 1). One events scan, no cache, no
    * self-join, no window — the retired `lag()` window funneled every
    * row through one partition, and the round-6 cached self-join
    * re-paid the aggregate's lineage in both join branches. The explode
    * doubles only the map-side input to the partial aggregate (tiny
    * (dt, 1, 0) carriers); partial combine collapses it to ~2 rows per
    * day per partition before the shuffle, so the plan has exactly the
    * exchanges of [[dauTotal]]: dedup, daily agg, output sort.
    */
  def dauDayOverDay(spark: SparkSession, dir: String): DataFrame = {
    // the day rides as a typed DATE (int) until the very end: integer
    // dedup/agg keys hash cheaper than 'yyyy-MM-dd' strings, the shadow
    // is a flat `date_add(d, 1)`, and the string formatting runs on one
    // row per calendar day instead of per deduped (day, user) row
    val e = Tables.events(spark, dir)
    e.select(to_date(col("ts")).as("d"), col("user_id"))
      .dropDuplicates("d", "user_id") // J5: per-day distinct
      .select(explode(array(
        struct(col("d").as("d"), lit(1L).as("td"), lit(0L).as("yd")),
        struct(date_add(col("d"), 1).as("d"),
          lit(0L).as("td"), lit(1L).as("yd")))).as("r"))
      .select("r.*")
      .groupBy("d")
      .agg(sum("td").as("dau"), sum("yd").as("dau_yd"))
      .where(col("dau") > 0)
      .select(date_format(col("d"), "yyyy-MM-dd").as("dt"),
        col("dau"), col("dau_yd"))
      .orderBy("dt")
  }
}
