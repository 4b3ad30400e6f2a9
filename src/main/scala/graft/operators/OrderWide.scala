package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Order wide table — batch re-expression of the reference's `dwd_OrderApp`
  * (/root/reference .../app/dwd_OrderApp.scala:98-249): fact⋈fact join of
  * order headers to order lines (J3/J4), dimension enrichment (J1/J2), and
  * the pure-projection schema widening that replaced reflective bean copy
  * (T9, util/MyBeanUtils.scala:30-59 → plain `select` under Catalyst).
  *
  * Scale notes:
  *  - orders ⋈ lineitem is the big shuffle join: both sides hash-partition
  *    on orderkey (sort-merge or shuffled-hash under AQE). At 100 TB both
  *    tables would be bucketed by orderkey so this join is shuffle-free.
  *  - customer / nation / region are dimensions → `broadcast()` them so the
  *    fact side never reshuffles for enrichment (reference did per-row Redis
  *    GETs; broadcast-hash is the Spark-native equivalent).
  *  - Derived money uses the same Double arithmetic the reference used
  *    (SURVEY §1.2: money is Double; kept for oracle parity).
  */
object OrderWide {

  /** J3 (header⋈lines) + T9 (wide projection) + F3 (date/hour derivation). */
  def orderWide(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .select(
        col("o_orderkey").as("order_id"),
        col("l_linenumber").as("detail_id"),
        col("o_custkey").as("user_id"),
        col("o_orderstatus").as("order_status"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("create_date"),
        date_format(col("o_orderdate"), "HH").as("create_hour"),
        col("l_partkey").as("sku_id"),
        col("l_quantity").as("sku_num"),
        col("l_extendedprice").as("order_price"),
        // raw IEEE product, NOT rounded: per-row double math is bitwise
        // identical across engines; round() semantics are not (Spark
        // HALF_UPs the shortest decimal repr, DuckDB rounds the binary)
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("split_total_amount"),
        col("o_totalprice").as("total_amount"))
      .orderBy("order_id", "detail_id")
  }

  /** J1/J2: dimension enrichment chain customer → nation → region as
    * broadcast-hash joins (reference: per-row Redis `GET DIM:$T:$id`).
    */
  def customerEnriched(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"),
        col("n_name").as("nation_name"),
        col("r_name").as("region_name"))
      .orderBy("c_custkey")
  }

  /** Supplier dim enrichment (same J1/J2 chain over the supplier side)
    * with per-nation account rollup. */
  def supplierStats(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        graft.functions.TextFunctions.moneySum(
          col("s_acctbal")).as("total_bal"))
      .orderBy("region_name", "nation_name")
  }

  /** Full enrichment: wide fact joined to broadcast dims — the complete
    * dwd_OrderApp shape (facts shuffled once on orderkey; dims broadcast).
    */
  def orderWideEnriched(spark: SparkSession, dir: String): DataFrame = {
    val wide = orderWide(spark, dir)
    val dims = customerEnriched(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("nation_name"), col("region_name"))
    wide.join(broadcast(dims), wide("user_id") === dims("c_custkey"), "left")
      .drop("c_custkey")
      .orderBy("order_id", "detail_id")
  }
}
