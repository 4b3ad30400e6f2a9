package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Pins the Kafka producer contract (S1/K1 config seam) — the one file
  * whose behavior can't run end-to-end in this image (no broker). */
class KafkaIOSpec extends SparkSpec {

  test("writer options pin the reference's durability/batching contract") {
    val opts = KafkaIO.writerOptions("broker:9092", "/cp", Some("DWD_PAGE_LOG"))
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("kafka.acks") == "all")
    assert(opts("kafka.enable.idempotence") == "true")
    assert(opts("kafka.batch.size") == "16384")
    assert(opts("kafka.linger.ms") == "1")
    assert(opts("checkpointLocation") == "/cp")
    assert(opts("topic") == "DWD_PAGE_LOG")
    // no default topic → per-row `topic` column routing, no topic option
    assert(!KafkaIO.writerOptions("b", "c", None).contains("topic"))
  }

  test("writeTopic carries exactly writerOptions on the DataStreamWriter") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String]
    val w = KafkaIO.writeTopic(mem.toDF().toDF("value"),
      "broker:9092", "/cp", Some("t1"))
    // the writer keeps its options in a private CaseInsensitiveMap —
    // locate it reflectively so the applied (not just intended) options
    // are the thing asserted
    def fields(c: Class[_]): Seq[java.lang.reflect.Field] =
      if (c == null) Nil else c.getDeclaredFields.toSeq ++ fields(c.getSuperclass)
    val applied = fields(w.getClass).flatMap { f =>
      f.setAccessible(true)
      f.get(w) match {
        case m: scala.collection.Map[_, _] =>
          Some(m.map { case (k, v) => (k.toString, v.toString) }.toMap)
        case _ => None
      }
    }.map(_.map { case (k, v) => (k.toLowerCase, v) })
      .find(_.contains("kafka.acks"))
    assert(applied.isDefined, "no options map found on the writer")
    val expected = KafkaIO.writerOptions("broker:9092", "/cp", Some("t1"))
    expected.foreach { case (k, v) =>
      assert(applied.get.get(k.toLowerCase).contains(v),
        s"option $k: ${applied.get.get(k.toLowerCase)} in ${applied.get}")
    }
  }
}
