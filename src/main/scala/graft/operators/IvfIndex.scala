package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.cosineNative
import graft.Tables

/** IVF (inverted-file) ANN index over the embeddings table — the scale
  * path past brute force: k-means-style coarse quantization, then search
  * probes only the `nprobe` closest cells.
  *
  * All stages are DataFrame-native and cluster-shaped:
  *  - training: Lloyd iterations where assignment is a broadcast of C
  *    centroids against a map-only scan (argmin via `min_by`), and the
  *    update step is one shuffle keyed (cell, dim) — no driver-side math
  *    over the corpus, so it scales to any N. C rows do come to the
  *    driver per iteration (the centroids themselves — KBs).
  *  - indexing: one map-only assignment pass → (vec_id, cell).
  *  - search: score the query against C centroids (broadcast), pick
  *    nprobe cells, then score ONLY vectors in those cells — the
  *    candidate scan shrinks by ~nprobe/C.
  *
  * Determinism: centroid init = the C lowest vec_ids, fixed iteration
  * count — reproducible up to floating-point aggregation order (hence
  * ANN queries are rows-only checked, not value-hashed).
  */
object IvfIndex {

  /** Train C centroids with `iters` Lloyd iterations.
    * Returns (cell INT, centroid ARRAY<FLOAT>). */
  def train(spark: SparkSession, dir: String, cells: Int = 16,
      iters: Int = 3): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    var centroids = emb.orderBy("vec_id").limit(cells)
      .orderBy("vec_id")
      .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
          .as("cell"),
        col("embedding").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assign(emb, centroids)
      centroids = assigned
        .join(emb, "vec_id")
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(avg(col("v")).as("m"))
        .groupBy("cell")
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid"))
    }
    centroids
  }

  /** Map-only cell assignment: argmin cosine distance over the broadcast
    * centroid set. Returns (vec_id, cell). */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cell"),
        cosineNative(col("embedding"), col("centroid")).as("sim"))
      .groupBy("vec_id")
      .agg(min_by(col("cell"), -col("sim")).as("cell"))

  /** ANN search: probe the `nprobe` cells nearest to the query, score
    * only their members, return top-k (vec_id, score). */
  def search(spark: SparkSession, dir: String, centroids: DataFrame,
      queryId: Long, k: Int = 10, nprobe: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val q = emb.where(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    val probeCells = centroids.crossJoin(broadcast(q))
      .select(col("cell"),
        cosineNative(col("centroid"), col("q_embedding")).as("sim"))
      .orderBy(desc("sim"), col("cell"))
      .limit(nprobe)
      .select("cell")
    val index = assign(emb, centroids)
    emb.join(index, "vec_id")
      .join(broadcast(probeCells), "cell")
      .where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosineNative(col("embedding"), col("q_embedding")), 6).as("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }
}
