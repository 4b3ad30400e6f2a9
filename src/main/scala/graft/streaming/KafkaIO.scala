package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Production Kafka wiring (S1 source / K1 sink). The container has no
  * Kafka connector or broker, so this is the configuration seam only —
  * every transform in this package is source-agnostic and is tested via
  * MemoryStream; binding to Kafka is exactly these few lines.
  *
  * The reference's tuning maps onto connector options
  * (util/MyKafkaUtils.scala:38-44, 88-91):
  *   acks=all + idempotence  → kafka.acks / kafka.enable.idempotence
  *   batch.size / linger.ms  → kafka.batch.size / kafka.linger.ms
  *   auto.offset.reset=latest→ startingOffsets=latest
  *   Redis offset bootstrap  → checkpointLocation (S2)
  *   per-partition flush before offset commit → epoch commit protocol
  */
object KafkaIO {

  /** S1: subscribe and surface the JSON payload as `value` (string). */
  def readTopic(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("value"))

  /** The exact option map [[writeTopic]] applies — a pure function so
    * the producer contract is unit-testable without a broker. */
  def writerOptions(bootstrap: String, checkpoint: String,
      defaultTopic: Option[String] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "kafka.acks" -> "all",
      "kafka.enable.idempotence" -> "true",
      "kafka.batch.size" -> "16384",
      "kafka.linger.ms" -> "1",
      "checkpointLocation" -> checkpoint) ++
      defaultTopic.map("topic" -> _)

  /** K1: produce `value` (and optional per-row `topic` column for the
    * demux fan-out — ONE writer, five topics) with the reference's
    * durability/batching knobs. */
  def writeTopic(df: DataFrame, bootstrap: String, checkpoint: String,
      defaultTopic: Option[String] = None): DataStreamWriter[Row] =
    df.writeStream.format("kafka")
      .options(writerOptions(bootstrap, checkpoint, defaultTopic))
}
