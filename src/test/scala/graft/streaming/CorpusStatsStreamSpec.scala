package graft.streaming

import graft.SparkSpec
import graft.operators.{FuzzyJoin, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming twin of the corpus text-statistics family
  * (q127/q128): accumulated count partials + shared ranking/linking,
  * pinned bit-equal to the batch operators on the streamed corpus. */
class CorpusStatsStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // deterministic doc fixture over a small vocabulary with dense
  // near-catalog bigrams ("small ring"-adjacent mentions included)
  private val vocab = Vector("small", "ring", "rind", "line", "a", "b", "cc")
  private def fixtureDocs: Seq[String] =
    (0 until 40).map { i =>
      (0 until 3 + i % 9).map(j => vocab(((i * 7 + j * j + j) % 13) % vocab.size))
        .mkString(" ")
    } :+ "" :+ "small" // empty and single-token docs: no bigrams

  private val dims = Seq("small ring", "line a", "zz zz")

  private def colloRows(df: DataFrame): Seq[(String, String, Long, Long)] =
    df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("collocation + entity-link snapshots match the batch operators " +
      "bit-for-bit, including a replayed epoch") {
    val outDir = Files.createTempDirectory("corpus_stats").toString
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("text")
      .writeStream
      .foreachBatch(CorpusStatsStream.countsSinkEachBatch(outDir) _)
      .outputMode("append").start()
    fixtureDocs.grouped(15).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()

    val batchDocs = fixtureDocs.toDF("text")
    assert(colloRows(CorpusStatsStream.collocationSnapshot(spark, outDir,
        minCount = 2L, topK = 50)) ==
      colloRows(TextAnalysis.pmiCollocationsOn(batchDocs,
        minCount = 2L, topK = 50)))

    val batchMentions = TextAnalysis
      .bigrams(batchDocs.select(
        graft.functions.TextFunctions.tokens(col("text")).as("l")))
      .select(concat(col("a"), lit(" "), col("b")).as("mention"))
      .groupBy("mention").agg(count(lit(1)).as("n_occ"))
    val want = colloRows(FuzzyJoin.fuzzyLinkOn(batchMentions,
      dims.toDF("name")))
    graft.Caches.releaseAll()
    val got = colloRows(CorpusStatsStream.entityLinkSnapshot(spark, outDir,
      dims.toDF("name")))
    graft.Caches.releaseAll()
    assert(got == want && got.nonEmpty, s"got $got")

    // replay: re-running an epoch's sink with the same id must
    // converge (overwrite-own-partition), not double-count
    CorpusStatsStream.countsSinkEachBatch(outDir)(
      Seq("small ring small").toDF("text"), 77L)
    val once = colloRows(CorpusStatsStream.collocationSnapshot(spark,
      outDir, minCount = 1L, topK = 1000))
    CorpusStatsStream.countsSinkEachBatch(outDir)(
      Seq("small ring small").toDF("text"), 77L)
    val twice = colloRows(CorpusStatsStream.collocationSnapshot(spark,
      outDir, minCount = 1L, topK = 1000))
    assert(once == twice, "epoch replay changed the accumulated counts")
  }

  test("the accumulation survives a restart from its checkpoint") {
    val base = Files.createTempDirectory("corpus_cp").toString
    val srcDir = s"$base/src"; val outDir = s"$base/out"
    val cp = s"$base/_cp"
    new java.io.File(srcDir).mkdirs()
    def writeBatch(name: String, docs: Seq[String]): Unit =
      docs.toDF("text").write.json(s"$srcDir/$name")
    def startQuery() =
      spark.readStream.schema("text STRING").json(s"$srcDir/*/")
        .writeStream
        .foreachBatch(CorpusStatsStream.countsSinkEachBatch(outDir) _)
        .option("checkpointLocation", cp)
        .outputMode("append").start()

    writeBatch("b1", fixtureDocs.take(20))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    writeBatch("b2", fixtureDocs.drop(20)) // arrives while the query is down
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    assert(colloRows(CorpusStatsStream.collocationSnapshot(spark, outDir,
        minCount = 2L, topK = 50)) ==
      colloRows(TextAnalysis.pmiCollocationsOn(fixtureDocs.toDF("text"),
        minCount = 2L, topK = 50)))
  }
}
