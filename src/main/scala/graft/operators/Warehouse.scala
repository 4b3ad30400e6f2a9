package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed-warehouse layout: the shuffle-elimination path for the big
  * fact⋈fact join at scale.
  *
  * orders ⋈ lineitem shuffles both sides on orderkey every query. At
  * 100 TB that shuffle IS the query cost, so the warehouse stores both
  * facts bucketed (and sorted) by the join key: Spark then plans a
  * sort-merge join with NO Exchange on either side — each bucket pair
  * joins locally. The same layout serves every downstream orderkey
  * join/aggregation for free; `BucketingSpec` asserts the plan has no
  * shuffle before the join.
  */
object Warehouse {

  /** Write orders + lineitem bucketed by orderkey into the session
    * catalog (idempotent: overwrites). `buckets` would be sized at
    * cluster scale (e.g. ~2× executors); tests use a small count. */
  def bucketize(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    // drop table AND any orphaned location (a killed prior session leaves
    // the directory behind while the in-memory catalog forgets the table)
    Seq("orders_bkt", "lineitem_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      if (loc.exists()) deleteRecursively(loc)
    }
    Tables.orders(spark, dir).write
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    Tables.lineitem(spark, dir).write
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_bkt")
  }

  /** The order-wide join over the bucketed layout — same result as
    * `OrderWide.orderWide`, shuffle-free plan. */
  def orderWideBucketed(spark: SparkSession): DataFrame = {
    val o = spark.table("orders_bkt")
    val li = spark.table("lineitem_bkt")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .select(
        col("o_orderkey").as("order_id"),
        col("l_linenumber").as("detail_id"),
        col("o_custkey").as("user_id"),
        col("l_extendedprice").as("order_price"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("split_total_amount"))
  }

  /** SCD Type-2 dimension history from the CDC-normalized change feed —
    * the warehouse-side extension of the reference's dim path: its Redis
    * upsert (K3, `ods_BaseDBApp.scala:100-115`) keeps only the LATEST
    * dimension row; a Type-2 build keeps every version with its validity
    * interval, the standard Kimball treatment.
    *
    * Change detection is null-safe value comparison per key in event
    * order (ties broken by the change sequence id): a change row that
    * repeats the current attribute value opens NO new version — only
    * transitions do. `valid_to` of a version is the `valid_from` of the
    * next (half-open intervals); the open version has null `valid_to`
    * and `is_current = 1`. Timestamps surface as epoch MICROS (BIGINT)
    * — engine-independent, no format round-trip.
    *
    * Scale shape: ONE shuffle on the dimension key; the change-filter
    * preserves partitioning and sort order, so the second window (the
    * lead) plans with no new Exchange. Nothing is driver-side; a key's
    * history never leaves its partition. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    // the q08/T6 CDC contract: signup/purchase are inserts, click/view
    // are updates (all carry the attribute), 'error' rows are dropped
    val changes = Tables.events(spark, dir)
      .where(col("event_type").isin("signup", "purchase", "click", "view"))
      .select(col("user_id").as("key"), col("ts"),
        col("event_id").as("seq"),
        from_json(col("props"), Demux.propsSchema).getField("k").as("attr"))
    scd2HistoryOn(changes)
  }

  /** [[scd2History]] over an explicit change relation
    * (key, ts, seq, attr) — `seq` totally orders same-timestamp changes
    * of one key (a CDC log's offset). */
  def scd2HistoryOn(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("ts"), col("seq"))
    val transitions = changes
      .withColumn("prev_attr", lag(col("attr"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      // null-safe: a null→value or value→null flip IS a transition; a
      // repeated value (null included) is not
      .where(col("rn") === 1 || !(col("attr") <=> col("prev_attr")))
    transitions
      .select(col("key"),
        row_number().over(w).cast("long").as("version"),
        col("attr"),
        unix_micros(col("ts").cast("timestamp")).as("valid_from_us"),
        lead(unix_micros(col("ts").cast("timestamp")), 1).over(w).as("valid_to_us"))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, lit(1)).otherwise(lit(0)))
      .orderBy("key", "version")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
