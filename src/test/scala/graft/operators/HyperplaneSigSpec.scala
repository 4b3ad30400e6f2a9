package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native hyperplane-LSH signature kernel
  * (org.apache.spark.sql.graft.HyperplaneSig) against its pre-kernel
  * composed witness — the CellArgmax round's discipline applied to the
  * last remaining composed signature tree (round-9 verdict #4). */
class HyperplaneSigSpec extends SparkSpec {

  private val planes = Similarity.LshPlanes

  test("native HyperplaneSig ≡ composed zip_with/aggregate folds (bitwise)") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val native = emb
      .select(col("vec_id"), Similarity.bucketSignature(planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = emb
      .select(col("vec_id"),
        Similarity.bucketSignatureComposed(planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.nonEmpty && native == composed)
  }

  test("NULL embedding yields NULL signature in both forms") {
    import spark.implicits._
    val edge = Seq((1L, None: Option[Array[Float]]))
      .toDF("vec_id", "embedding")
    val n = edge.select(Similarity.bucketSignature(planes)).collect()
    val c = edge.select(Similarity.bucketSignatureComposed(planes)).collect()
    assert(n(0).isNullAt(0) && c(0).isNullAt(0))
  }

  test("width mismatch raises loudly instead of zeroing bucket bits") {
    import spark.implicits._
    val bad = Seq((1L, Array(0.5f, -1.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      bad.select(Similarity.bucketSignature(planes)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dim")), s"unexpected: $e")
  }

  test("signature stays inside whole-stage codegen with one kernel node") {
    val exec = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.bucketSignature(planes).as("b"))
      .queryExecution.executedPlan
    assert(exec.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      exec.toString)
    val plan = exec.toString
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("),
      s"composed lambda folds leaked into the production plan:\n$plan")
  }
}
