package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order wide table — Structured Streaming re-expression of the
  * reference's `dwd_OrderApp` dual-stream join (/root/reference
  * SparkSreaming_realtime .../app/dwd_OrderApp.scala:157-224).
  *
  * The reference does a within-batch fullOuterJoin plus a Redis cache
  * with 24 h TTL on both sides: a match is emitted in the batch where the
  * SECOND side arrives, and one info row can match N detail rows (the
  * info cache is written even when matched, :186-187). In Structured
  * Streaming J3+J4 are ONE operator: a watermarked stream-stream inner
  * join. Spark keeps both sides' state (the Redis cache), emits on late
  * match (cross-batch completion), supports 1:N fan-out, and evicts
  * state by watermark (the TTL). The ±24 h time-range predicate bounds
  * the state exactly like the reference's `setex 24*3600`.
  *
  * Scale: the join shuffles both streams on order_id once; state is
  * hash-partitioned with the same key, so matching is local. Skewed hot
  * orders are impossible by construction (order_id is unique on the info
  * side); AQE is irrelevant in streaming but partition count follows
  * `spark.sql.shuffle.partitions`.
  */
object OrderJoinStream {

  /** Watermarked stream-stream inner join: `info` (header) ⋈ `detail`
    * (lines) on order id, detail event-time within ±`ttlHours` of the
    * header's. Inputs carry event-time column `ts` (TimestampType).
    */
  def join(info: DataFrame, detail: DataFrame,
      ttlHours: Int = 24): DataFrame = {
    val i = info.withColumnRenamed("ts", "info_ts")
      .withWatermark("info_ts", s"$ttlHours hours")
    val d = detail.withColumnRenamed("ts", "detail_ts")
      .withWatermark("detail_ts", s"$ttlHours hours")
    i.join(d,
      i("order_id") === d("detail_order_id") &&
        d("detail_ts") >= i("info_ts") - expr(s"INTERVAL $ttlHours HOURS") &&
        d("detail_ts") <= i("info_ts") + expr(s"INTERVAL $ttlHours HOURS"),
      "inner")
  }

  /** OrderWide projection (T9 as pure select — the reference's reflective
    * bean copy, util/MyBeanUtils.scala:30-59, is a projection here). */
  def toWide(joined: DataFrame): DataFrame =
    joined.select(
      col("order_id"), col("detail_id"), col("user_id"),
      col("order_status"), col("total_amount"),
      col("sku_id"), col("sku_num"), col("order_price"),
      (col("order_price") * col("sku_num")).as("split_total_amount"),
      date_format(col("info_ts"), "yyyy-MM-dd").as("create_date"),
      date_format(col("info_ts"), "HH").as("create_hour"))
}
