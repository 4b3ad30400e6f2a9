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

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
