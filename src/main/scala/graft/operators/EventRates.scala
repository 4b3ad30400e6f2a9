package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-windowed event statistics — the standard streaming-analytics
  * aggregation shape (tumbling event-time windows). The batch form below
  * is oracle-checked; the same expression bound to a stream with
  * `withWatermark` is the streaming form (see `windowedCountsStream`).
  */
object EventRates {

  /** Tumbling 1-hour windows × event_type: count + value rollup. */
  def hourlyStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        graft.functions.TextFunctions.moneySum(
          col("value")).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("cnt"), col("total_value"))
      .orderBy("wstart", "event_type")

  /** Streaming twin: watermarked tumbling windows (append-mode capable). */
  def windowedCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Top-k per group via window ranking (no reference counterpart; the
    * canonical "top N per key" shape): 3 most frequent tokens per lang. */
  def topTokensPerLang(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(desc("cnt"), col("token"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .orderBy("lang", "rank")
  }
}
