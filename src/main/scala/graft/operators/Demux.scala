package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Content-based routing & CDC normalization — batch re-expression of the
  * reference's `ods_BaseLogApp` (T5 demux, /root/reference .../app/
  * ods_BaseLogApp.scala:79-181) and `ods_BaseDBApp` (T6 op-normalize +
  * T7 table routing, .../app/ods_BaseDBApp.scala:67-115).
  *
  * The reference demuxed one Kafka topic into five with per-row imperative
  * branching; here routing is a single declarative pass — a `when` chain
  * computing the target, then one shuffle-free groupBy per sink (or, in the
  * streaming module, a per-row `topic` column on the Kafka writer so the
  * whole fan-out is ONE pass with no cache/recompute).
  */
object Demux {

  /** Schema of the `props` JSON payload carried by events (T1 generic
    * JSON parse — reference used fastjson `JSON.parseObject`). */
  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** F5 topic synthesis + T5 routing: each event gets its DWD topic name,
    * then per-topic volume/value rollup (what each sink would receive). */
  def routeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("topic", concat(lit("DWD_"), upper(col("event_type"))))
      .groupBy("topic")
      .agg(
        count(lit(1)).as("cnt"),
        graft.functions.TextFunctions.moneySum(
          col("value")).as("total_value"))
      .orderBy("topic")

  /** T6 CDC op normalization: map event types onto insert/update/delete the
    * way Maxwell types were normalized (bootstrap-insert→insert, unknown →
    * silently dropped — SURVEY §7.4 risk 5: replicate, don't improve). */
  def cdcNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("op",
        when(col("event_type") === "signup", "insert")
          .when(col("event_type") === "purchase", "insert")
          .when(col("event_type") === "click", "update")
          .when(col("event_type") === "view", "update")
          .otherwise(lit(null).cast(StringType))) // 'error' etc. dropped
      .where(col("op").isNotNull)
      .groupBy("op")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("op")

  /** T7 routing by config set: fact-vs-dim table routing driven by a small
    * config relation (reference read the sets from Redis and broadcast
    * them; here the config is a broadcast-joined lookup table). */
  def routeByConfig(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val config = Seq(
      ("purchase", "FACT"), ("signup", "FACT"),
      ("click", "FACT"), ("view", "FACT"),
      ("error", "DIM")).toDF("event_type", "route")
    Tables.events(spark, dir)
      .join(broadcast(config), Seq("event_type"), "inner")
      .groupBy("route", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("route", "event_type")
  }

  /** T1: parse the JSON `props` payload, extract `k`, aggregate per type.
    * `from_json` with a fixed schema = the reference's typed fastjson parse. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")
}
