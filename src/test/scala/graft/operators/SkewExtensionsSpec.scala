package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted-join equivalence and the SQL surface of the native functions. */
class SkewExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 10k rows all on one hot key + a long tail — the salting target
    val skewed = (Seq.fill(10000)(1L) ++ (2L to 100L)).toDF("k")
      .withColumn("payload", col("k") * 10)
    val dim = (1L to 100L).map(i => (i, s"name_$i")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k"), "inner")
      .groupBy("k").agg(count(lit(1)).as("c"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", buckets = 8)
      .groupBy("k").agg(count(lit(1)).as("c"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin preserves left_outer; rejects join types salting breaks") {
    val skewed = Seq(1L, 1L, 99L).toDF("k") // 99 has no dim match
    val dim = Seq((1L, "one")).toDF("k", "name")
    val lo = SkewJoin.saltedJoin(skewed, dim, "k", buckets = 4, "left_outer")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    // unmatched LEFT row appears exactly once (left side is not replicated)
    assert(lo == Map((1L, Some("one")) -> 2, (99L, None) -> 1), s"got $lo")
    // right/full outer would emit unmatched DIM rows once per bucket
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(skewed, dim, "k", buckets = 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(skewed, dim, "k", buckets = 4, "full_outer")
    }
  }

  test("native functions are callable from SQL via GraftExtensions") {
    val cos = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)))")
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 0.9922778767136677) < 1e-12)
    val sh = spark.sql("SELECT shingle_set('a b c d', 3)")
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val mh = spark.sql("SELECT minhash_sig('a b c d', 3, 16)")
      .collect()(0).getSeq[Long](0)
    assert(mh.length == 16)
    val sim = spark.sql("SELECT simhash_sig('a b c d', 48)")
      .collect()(0).getLong(0)
    assert(sim >= 0L && sim < (1L << 48))
    val gh = spark.sql("SELECT gram_hashes('a b c d', 3)")
      .collect()(0).getSeq[Long](0)
    // hash-twin check in SQL: md5Long of each positional gram
    val gh2 = spark.sql(
      "SELECT array(CAST(conv(substr(md5('a b c'), 1, 15), 16, 10) AS BIGINT)" +
        ", CAST(conv(substr(md5('b c d'), 1, 15), 16, 10) AS BIGINT))")
      .collect()(0).getSeq[Long](0)
    assert(gh == gh2)
  }

  test("windowed streaming aggregation emits closed windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventRates.windowedCountsStream(df)
      .writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (t("2024-01-01 10:05:00"), "view", 1.0),
      (t("2024-01-01 10:45:00"), "view", 2.0),
      (t("2024-01-01 10:50:00"), "click", 3.0))
    q.processAllAvailable()
    // advance the watermark far enough to close the 10:00 window
    mem.addData((t("2024-01-01 14:00:00"), "view", 4.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 18:00:00"), "view", 5.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("winagg")
      .select(col("window.start").cast("string"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("2024-01-01 10:00:00", "view", 2L)))
    assert(rows.contains(("2024-01-01 10:00:00", "click", 1L)))
  }
}
