package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens

/** Relevance ranking for the serving layer — Okapi BM25 (Robertson et
  * al., public literature; the default scorer of Lucene/Elasticsearch).
  * This is the real replacement for the reference's ES relevance
  * ordering (`PublisherMapperImpl.java:112-159` returns hits in ES score
  * order), which the detail-page operators had deliberately pinned to a
  * deterministic sort: [[bm25Rank]] reproduces score-ordered retrieval
  * with engine-replicable arithmetic.
  *
  * Scale shape: per-document stats (dl, per-term tf) are ONE fold over
  * the token array, map-side on the scan; corpus stats (N, avgdl, df_t)
  * are one tiny aggregate broadcast back; scoring is map-only; the top-N
  * is a k-bounded TakeOrdered heap — no global sort, no shuffle of the
  * corpus. Two passes over the corpus total (stats + scoring), with the
  * compact (doc_id, dl, tf*) carrier cached between them.
  */
object Ranking {

  /** Top-`topN` documents by BM25 score for `terms` (exact whitespace-
    * token match, like the serving layer's token-exact variant).
    * Output: (doc_id, score), score rounded to 4 dp, ordered by
    * (score desc, doc_id).
    *
    * Determinism contract with the oracle: dl/tf/df/N are integers held
    * in doubles (exact at any sum order); avgdl divides two exact
    * integers; every float op is a correctly-rounded IEEE +,-,*,/ applied
    * in the same textual order on both sides. The one transcendental is
    * `ln` in the idf — libm-identical in practice, and the score is
    * rounded to 4 dp on both sides before compare/order. */
  def bm25Rank(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "vector"),
      k1: Double = 1.2, b: Double = 0.75, topN: Int = 50): DataFrame =
    bm25RankOn(Tables.documents(spark, dir), terms, k1, b, topN)

  /** [[bm25Rank]] over an explicit (doc_id, text) relation. */
  def bm25RankOn(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topN: Int = 50): DataFrame =
    bm25ScoresOn(docs, terms, k1, b, requireAllTerms = false)
      .orderBy(desc("score"), col("doc_id"))
      .limit(topN)

  /** The unlimited core of [[bm25RankOn]]: (doc_id, score) for every
    * document containing at least one query term — or, with
    * `requireAllTerms`, EVERY term (the ES match-AND contract of the
    * serving layer). No ordering, no cut: callers that page (the ranked
    * detail endpoint) window this instead of top-N-ing it. */
  def bm25ScoresOn(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      requireAllTerms: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "bm25Rank needs at least one query term")
    // ONE fold computes dl + every per-term tf: split-out Columns would
    // re-tokenize once per term (Catalyst does no CSE inside an
    // expression tree — same trap as TextFunctions.qualityScore)
    val zero = struct(
      (lit(0L).as("dl") +: terms.indices.map(i => lit(0L).as(s"tf$i"))): _*)
    val fold = aggregate(tokens(col("text")), zero,
      (acc, t) => struct(
        ((acc.getField("dl") + lit(1L)).as("dl") +:
          terms.zipWithIndex.map { case (term, i) =>
            (acc.getField(s"tf$i") +
              when(t === lit(term), lit(1L)).otherwise(lit(0L))).as(s"tf$i")
          }): _*))
    val tfCols: Seq[Column] =
      col("f.dl").as("dl") +: terms.indices.map(i => col(s"f.tf$i").as(s"tf$i"))
    val tfRel = graft.Caches.register(
      docs.select(col("doc_id"), fold.as("f"))
        .select((col("doc_id") +: tfCols): _*)
        .cache())
    val statCols: Seq[Column] =
      count(lit(1)).cast("double").as("n_docs") +:
        (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
          .as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, lit(1L)).otherwise(lit(0L)))
            .cast("double").as(s"df$i"))
    val stats = tfRel.agg(statCols.head, statCols.tail: _*)
    val joined = tfRel.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val df = col(s"df$i")
      val idf = log(lit(1.0) + (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * (col("dl").cast("double") / col("avgdl"))))
    }.reduce(_ + _)
    val matched = terms.indices.map(i => col(s"tf$i") > 0)
      .reduce((x, y) => if (requireAllTerms) x && y else x || y)
    joined
      .where(matched)
      .select(col("doc_id"), graft.functions.TextFunctions.roundStable(score, 4).as("score"))
  }

  /** Hybrid lexical+vector retrieval fused by Reciprocal Rank Fusion
    * (Cormack et al., SIGIR 2009 — the standard ES/OpenSearch hybrid-
    * search combiner): the BM25 top-`kEach` list and the cosine-ANN
    * top-`kEach` list each contribute `1/(rrfK + rank)` and the fused
    * score orders the final cut. RRF needs only RANKS, never the two
    * engines' incomparable raw scores — which is exactly why serving
    * stacks use it to merge a keyword index with a vector index.
    *
    * Scale shape: both input lists are k-bounded TakeOrdered heaps over
    * map-only scoring scans (the [[bm25RankOn]] / `Similarity.topK`
    * plans, unchanged); everything after operates on ≤ 2·kEach rows —
    * the rank windows and the fusion aggregate are driver-trivial no
    * matter the corpus size. At 100 TB the vector side swaps in the
    * IVF/PQ partition-pruned scan and this fusion layer is untouched.
    *
    * Determinism contract: ranks are row_numbers over each list's
    * already-rounded (score, id) order — the same order the green q68 /
    * q26 oracles pin. Each contribution `1.0/(rrfK + rank)` is one IEEE
    * division on exact integer operands; the fused sum adds the two
    * terms in fixed textual order (lex + vec); rounded to 6 dp.
    *
    * Output: (doc_id, lex_rank, vec_rank, rrf), ranks null when the doc
    * appears in only one list, ordered by (rrf desc, doc_id), top-`topN`.
    */
  def hybridRrf(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "vector"), queryId: Long = 0L,
      kEach: Int = 50, rrfK: Int = 60, topN: Int = 20): DataFrame =
    rrfFuse(
      bm25Rank(spark, dir, terms, topN = kEach),
      Similarity.topK(spark, dir, queryId, k = kEach)
        .withColumnRenamed("vec_id", "doc_id"),
      rrfK, topN)

  /** Ceiling on either [[rrfFuse]] input's PROVABLE row bound. The
    * fusion layer single-partition-sorts its inputs, which is only
    * sane for k-bounded candidate lists; 100k rows sort in
    * milliseconds on one task, and no real `kEach` approaches it. */
  val MaxFuseListRows = 100000L

  /** The fusion core of [[hybridRrf]]: two (doc_id, score) candidate
    * LISTS (already k-bounded — this layer must never see a corpus
    * relation) → fused (doc_id, lex_rank, vec_rank, rrf) top-`topN`.
    *
    * The k-bounded precondition is MECHANICAL, not conventional: each
    * input's analyzed plan must PROVE a row bound ≤ [[MaxFuseListRows]]
    * (`maxRows` — a `limit()`/TakeOrdered anywhere under projections
    * provides it). An unbounded relation fails loudly at plan time
    * (zero execution cost) instead of silently funneling a corpus
    * through a single-task sort — the fuzzyPairs/cdcDedup
    * loud-failure discipline. */
  def rrfFuse(lex: DataFrame, vec: DataFrame,
      rrfK: Int = 60, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def requireBounded(df: DataFrame, side: String): Unit = {
      val mr = df.queryExecution.analyzed.maxRows
      require(mr.exists(_ <= MaxFuseListRows),
        s"rrfFuse: the $side input does not prove a row bound <= " +
          s"$MaxFuseListRows (plan maxRows = ${mr.getOrElse("unbounded")})" +
          " — pass a limit()-bounded candidate list (bm25Rank/topK " +
          "shapes); fusing a corpus relation would single-task sort it")
    }
    requireBounded(lex, "lex")
    requireBounded(vec, "vec")
    // single-partition windows are fine HERE ONLY: both inputs are
    // k-bounded lists, not corpus relations (require-guarded above)
    val lexRanked = lex.select(col("doc_id"),
      row_number().over(Window.orderBy(desc("score"), col("doc_id")))
        .cast("long").as("lex_rank"),
      lit(null).cast("long").as("vec_rank"))
    val vecRanked = vec.select(col("doc_id"),
      lit(null).cast("long").as("lex_rank"),
      row_number().over(Window.orderBy(desc("score"), col("doc_id")))
        .cast("long").as("vec_rank"))
    val contrib = (r: Column) =>
      coalesce(lit(1.0) / (lit(rrfK).cast("double") + r.cast("double")),
        lit(0.0))
    lexRanked.unionByName(vecRanked)
      .groupBy("doc_id")
      .agg(min("lex_rank").as("lex_rank"), min("vec_rank").as("vec_rank"))
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        graft.functions.TextFunctions.roundStable(
          contrib(col("lex_rank")) + contrib(col("vec_rank")), 6).as("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
      .limit(topN)
  }

  /** A4 in the reference's TRUE serving order. The reference's ES
    * returned detail hits in relevance-score order
    * (`PublisherMapperImpl.java:112-159`); the engine's `detailByItem`
    * had deliberately pinned a deterministic (l_orderkey, l_linenumber)
    * sort as the stand-in. This is the ranked mode: the sku corpus (the
    * part dim — one document per p_partkey, p_name analyzed exactly like
    * the q44 serving matcher: lowercased, split on non-alphanumerics) is
    * BM25-scored against the analyzed query; matching is AND over the
    * query terms (the q44 contract); lines of matched skus order by
    * (score desc, l_orderkey, l_linenumber) — fully deterministic, score
    * rounded to 4 dp — and the page window cuts.
    *
    * Scale shape: corpus stats are one aggregate over the part DIM (the
    * idf source, like an ES index), never lineitem; the scored match
    * set is a dim-sized broadcast into lineitem — J1's join shape with
    * a score column riding. */
  def detailByItemRanked(spark: SparkSession, dir: String,
      itemName: String, pageNo: Int = 1, pageSize: Int = 20): DataFrame = {
    val terms = itemName.toLowerCase.split("[^a-z0-9]+")
      .filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, s"no analyzable tokens in '$itemName'")
    // re-serialize the analyzed token array to whitespace form so the
    // fold's whitespace tokenizer sees exactly the analyzer's tokens
    val partDocs = Tables.part(spark, dir)
      .select(col("p_partkey").as("doc_id"),
        concat_ws(" ", array_remove(
          split(lower(col("p_name")), "[^a-z0-9]+"), "")).as("text"))
    val scored = bm25ScoresOn(partDocs, terms, requireAllTerms = true)
    val sk = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .join(broadcast(scored), col("p_partkey") === col("doc_id"))
    val li = Tables.lineitem(spark, dir)
    li.join(broadcast(sk), li("l_partkey") === sk("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("p_name").as("sku_name"),
        col("l_quantity").as("sku_num"),
        col("l_extendedprice").as("order_price"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_amount"),
        col("p_brand"), col("p_type"), col("score"))
      .orderBy(desc("score"), col("l_orderkey"), col("l_linenumber"))
      .offset((pageNo - 1) * pageSize)
      .limit(pageSize)
  }
}
