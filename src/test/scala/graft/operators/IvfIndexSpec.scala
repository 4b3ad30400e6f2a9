package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF index: structure, full-probe exactness, partial-probe recall,
  * and the materialized-index plan shape (map-only assignment). */
class IvfIndexSpec extends SparkSpec {

  private lazy val cents = IvfIndex.train(spark, sf, cells = 8, iters = 2)

  test("train yields one centroid per cell with the right dimensionality") {
    assert(cents.length == 8)
    assert(cents.map(_._1).toSet == (0 until 8).toSet)
    assert(cents.forall(_._2.length == 64))
  }

  test("every vector is assigned to exactly one cell") {
    val emb = graft.Tables.embeddings(spark, sf)
    val idx = IvfIndex.assign(emb.select("vec_id", "embedding"), cents)
    assert(idx.count() == emb.count())
    assert(idx.groupBy("vec_id").count().where(col("count") > 1).count() == 0)
  }

  test("assignment is map-only: zero shuffles in the plan") {
    val emb = graft.Tables.embeddings(spark, sf)
    val idx = IvfIndex.assign(emb.select("vec_id", "embedding"), cents)
    val plan = idx.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment plan shuffles:\n$plan")
  }

  test("nprobe = all cells reproduces the brute-force top-k exactly") {
    val ivf = IvfIndex.search(spark, sf, cents, queryId = 0L,
      k = 10, nprobe = 8).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.topK(spark, sf, queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == brute)
  }

  test("partial probe keeps useful recall at a fraction of the scan") {
    val ivf = IvfIndex.search(spark, sf, cents, queryId = 0L,
      k = 10, nprobe = 3).collect().map(_.getLong(0)).toSet
    val brute = Similarity.topK(spark, sf, queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (ivf & brute).size / 10.0
    assert(recall >= 0.3, s"recall@10 was $recall")
  }
}
