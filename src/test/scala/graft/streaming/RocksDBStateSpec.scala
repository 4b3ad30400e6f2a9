package graft.streaming

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Smoke test for the RocksDB state-store seam ([[GraftSession
  * .builderWithRocksDB]]): the provider class ships in this Spark build,
  * so the deployment config is exercised for real — a cross-batch
  * stateful dedup whose state lives in RocksDB, verified both by the
  * result (cross-batch suppression works) and by the query's state
  * operator reporting RocksDB-specific metrics. `providerClass` is a
  * runtime SQLConf read at query start, so the shared test session can
  * opt in per-query without rebuilding the session.
  */
class RocksDBStateSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stateful dedup runs on the RocksDB state store provider") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      GraftSession.RocksDBProvider)
    try {
      val cp = Files.createTempDirectory("rocksdb-cp").toString
      val mem = MemoryStream[(String, Long)]
      mem.addData(("u1", 1L), ("u1", 2L), ("u2", 3L))
      val q = mem.toDF().toDF("user_id", "ts")
        .dropDuplicates("user_id")
        .writeStream.format("memory").queryName("rocks_dedup")
        .outputMode("update")
        .option("checkpointLocation", cp)
        .start()
      q.processAllAvailable()
      mem.addData(("u1", 4L), ("u3", 5L)) // u1 suppressed ACROSS batches
      q.processAllAvailable()

      val stateOps = q.recentProgress.flatMap(_.stateOperators)
      assert(stateOps.nonEmpty, "no stateful operator reported progress")
      val metricKeys = stateOps.flatMap(_.customMetrics.keySet.toArray).toSet
      assert(metricKeys.exists(_.toString.startsWith("rocksdb")),
        s"state store is not RocksDB-backed; metrics: $metricKeys")
      q.stop()

      val users = spark.table("rocks_dedup")
        .select("user_id").as[String].collect().sorted.toSeq
      assert(users == Seq("u1", "u2", "u3"),
        "cross-batch dedup state must survive in RocksDB")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
