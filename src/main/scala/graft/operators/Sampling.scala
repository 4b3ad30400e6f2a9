package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.md5Long

/** Deterministic sampling for training-data pipelines. Both variants are
  * content-addressed (salted md5 of the key), NOT rng-based: the sample
  * is reproducible across engines, runs, partitionings and scale-ups —
  * re-running the pipeline on the grown corpus keeps every previously
  * selected doc selected (critical for incremental dataset builds), and
  * the oracle can replay the exact choice in SQL.
  *
  * Both are map-only filters / one-window rankings — no extra shuffles
  * beyond the stratified variant's per-stratum ranking.
  */
object Sampling {

  /** Salted-hash residue of a key column in [0, 100). */
  private def pctHash(key: org.apache.spark.sql.Column, salt: String) =
    md5Long(concat(lit(s"$salt:"), key.cast("string"))) % 100

  /** Deterministic hash rank of `doc_id` within each stratum — the ONE
    * ranking shared by stratified sampling and the curation quota (so
    * their semantics, and oracles, can never drift apart). */
  private[operators] def hashRank(strataCol: String, salt: String) =
    row_number().over(Window.partitionBy(strataCol)
      .orderBy(md5Long(concat(lit(s"$salt:"), col("doc_id").cast("string"))),
        col("doc_id")))
      .cast("long")

  /** Keep ~`pct`% of documents: rows whose salted md5 residue mod 100
    * falls under the rate. Map-only — the filter rides the scan. */
  def hashSample(spark: SparkSession, dir: String, pct: Int = 10,
      salt: String = "sample"): DataFrame =
    Tables.documents(spark, dir)
      .where(pctHash(col("doc_id"), salt) < pct)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** Stratified quota sample: exactly min(k, |stratum|) docs per `lang`
    * stratum, chosen by deterministic hash rank — the data-mixing
    * primitive (equalize language representation regardless of raw
    * corpus skew). One shuffle on the stratum key. */
  def stratifiedSample(spark: SparkSession, dir: String, k: Int = 20,
      salt: String = "strat"): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), hashRank("lang", salt).as("rk"))
      .where(col("rk") <= k)
      .orderBy("lang", "rk")

  /** Weighted mixture sample: per-stratum keep RATE (percent) from a
    * weights relation — the "dataset mixing recipe" form (e.g. upsample
    * low-resource languages, downsample boilerplate sources). Strata
    * absent from the recipe keep nothing. Broadcast join + map-only
    * filter — no shuffle of the corpus. */
  def sampleByWeights(spark: SparkSession, dir: String,
      weights: Seq[(String, Int)], salt: String = "mix"): DataFrame = {
    import spark.implicits._
    val w = weights.toDF("lang", "pct")
    Tables.documents(spark, dir)
      .join(broadcast(w), Seq("lang"))
      .where(pctHash(col("doc_id"), salt) < col("pct"))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Temperature-scaled mixture sampling (τ = 0.5): per-stratum keep RATE
    * ∝ count^(τ−1) = 1/√count, so the kept counts scale as √count — the
    * multilingual rebalancing scheme from the public literature (mBERT /
    * XLM-R / mT5 "exponentiated smoothing": majority languages are
    * downsampled, minority languages keep proportionally more) with the
    * rates DERIVED FROM MEASURED COUNTS instead of a hand recipe like
    * [[sampleByWeights]].
    *
    * Deterministic and engine-replicable: the per-lang threshold is
    * floor(1e6·scale/√count) over a parts-per-million salted-md5 residue.
    * √ and one multiply/divide are correctly-rounded IEEE ops, so Spark
    * and the SQL oracle compute bit-identical thresholds — no transcendental
    * functions whose libm rounding could diverge.
    *
    * Scale shape: one tiny count aggregate (|langs| rows) broadcasts back;
    * the corpus itself sees a map-only filter riding the scan. At extreme
    * stratum skew this beats the rank-based quota ([[stratifiedSample]]):
    * no per-stratum window sort, the expected kept count is scale·√count
    * with binomial concentration. */
  def temperatureSample(spark: SparkSession, dir: String, scale: Int = 4,
      salt: String = "tmix"): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
    val threshold = floor(lit(1000000.0) * scale /
      sqrt(col("cnt").cast("double"))).cast("long")
    docs.join(broadcast(counts), Seq("lang"))
      .where(md5Long(concat(lit(s"$salt:"), col("doc_id").cast("string")))
        % 1000000 < threshold)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Per-source document cap (the "domain cap" curation stage from the
    * public web-corpus literature — RefinedWeb / Gopher cap documents
    * per registered domain so no single site dominates the training
    * mix): keep at most `cap` docs per source, chosen by the same
    * deterministic salted-hash order as [[stratifiedSample]].
    *
    * Scale shape: [[stratifiedSample]]'s window formulation SORTS each
    * stratum, and a window partition cannot be split — one mega-domain
    * (a billion pages behind one source) pins a single task at 100 TB.
    * Here the k-bounded [[graft.functions.MinKLongAggregator]] carries
    * at most `cap` (hash, doc_id) pairs per source out of every map
    * task (partial aggregation), so shuffle bytes per source are
    * cap-sized regardless of the domain's row count and nothing ever
    * sorts a whole stratum. Exactness: the 60-bit md5 rank stays a
    * Long end-to-end (a Double score would truncate it at 53 bits and
    * drift from the oracle's integer ORDER BY). */
  def domainCap(spark: SparkSession, dir: String, cap: Int = 10,
      salt: String = "dcap"): DataFrame =
    domainCapOn(Tables.documents(spark, dir), cap, salt)

  /** [[domainCap]] over an explicit documents relation. */
  def domainCapOn(docs: DataFrame, cap: Int = 10,
      salt: String = "dcap"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = new graft.functions.MinKLongAggregator(cap)
    docs
      .select(col("source"),
        md5Long(concat(lit(s"$salt:"), col("doc_id").cast("string"))).as("h"),
        col("doc_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, h, id) => (h, id) }
      .agg(agg.toColumn.name("kept"))
      .toDF("source", "kept")
      .select(col("source"), explode(col("kept")).as("pair"))
      .select(col("source"), col("pair._2").as("doc_id"))
      .orderBy("source", "doc_id")
  }

  /** Cluster-balanced diversity sample: k-means-cluster the embedding
    * space (the q82/q38 integer-exact Lloyd, corpus-relative cell count)
    * and keep at most `cap` vectors per cluster, chosen by the same
    * deterministic salted-hash order as [[stratifiedSample]]. This is
    * the embedding-space analog of [[domainCap]] — the "semantic
    * diversity sampling" stage of the public curation literature (D4 /
    * SemDeDup-adjacent: dense regions of near-identical content get
    * capped, sparse regions keep everything), with clusters MEASURED
    * from the corpus instead of read from a `source` column.
    *
    * Scale shape: training is [[IvfIndex.trainCached]] (train-once
    * memoized); assignment is the map-only [[IvfIndex.cellExpr]] kernel
    * riding the scan; the per-cluster cut is the k-bounded
    * [[graft.functions.MinKLongAggregator]] — cap-sized shuffle bytes
    * per cell, no window ever sorts a whole cluster (the [[domainCap]]
    * argument, verbatim: one mega-cluster cannot pin a task). */
  def clusterBalancedSample(spark: SparkSession, dir: String,
      cap: Int = 24, iters: Int = 3, salt: String = "csamp"): DataFrame = {
    import spark.implicits._
    val nCells = Similarity.measuredCells(
      Tables.embeddings(spark, dir).count())
    val cents = IvfIndex.trainCached(spark, dir, nCells, iters)
    val agg = new graft.functions.MinKLongAggregator(cap)
    IvfIndex.assign(Tables.embeddings(spark, dir), cents)
      .select(col("cell"),
        md5Long(concat(lit(s"$salt:"), col("vec_id").cast("string")))
          .as("h"),
        col("vec_id"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, h, id) => (h, id) }
      .agg(agg.toColumn.name("kept"))
      .toDF("cell", "kept")
      .select(col("cell"), explode(col("kept")).as("pair"))
      .select(col("cell"), col("pair._2").as("vec_id"))
      .orderBy("cell", "vec_id")
  }

  /** Leakage-safe train/val/test split: the split label is keyed on
    * SOURCE, not doc_id, so every document from a domain lands in the
    * same split — near-duplicates within a site (boilerplate, templated
    * pages) can never straddle the train/eval boundary, the held-out-
    * domain hygiene rule from the public dataset literature. The
    * salted-md5 residue makes the assignment deterministic across
    * runs, engines, and corpus growth (a domain keeps its split as new
    * pages arrive — an incremental-build invariant, same argument as
    * [[hashSample]]). Map-only: the label is a scan-projection
    * expression; nothing shuffles but the output sort. */
  def leakageSafeSplit(spark: SparkSession, dir: String,
      valPct: Int = 10, testPct: Int = 10,
      salt: String = "split"): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100)
    val r = md5Long(concat(lit(s"$salt:"), col("source"))) % 100
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        when(r < testPct, lit("test"))
          .when(r < testPct + valPct, lit("val"))
          .otherwise(lit("train")).as("split"))
      .orderBy("doc_id")
  }

  /** Mixture upsampling by epochs: rebalance the training mix so every
    * source contributes equally by REPEATING under-represented sources'
    * documents (the data-mixing step of the public pretraining recipes —
    * small trusted corpora see multiple epochs while the web crawl sees
    * one; cf. the Pile / LLaMA mixture tables). Dual of [[domainCap]]
    * (which DOWN-samples the over-represented head): each source gets
    * `maxCnt / cnt` epochs, split into a whole part every document
    * repeats and a fractional part materialized by the same salted-md5
    * Bernoulli rule as [[hashSample]] — deterministic, content-
    * addressed, and exact in expectation per source.
    *
    * Fixed-point arithmetic end to end: `factor6 = (maxCnt * 1e6) div
    * cnt` ≥ 1e6 splits into `epochs = factor6 div 1e6` (≥ 1) and `rem =
    * factor6 mod 1e6`; a document gets `epochs + (h < rem)` replicas.
    * Integer division on both engines (positive operands, truncation =
    * floor), so the replica count — not just its expectation — is
    * hash-exact.
    *
    * Scale shape: the per-source factor table is |sources|-sized and
    * broadcasts; the corpus side is one map-only pass whose `explode`
    * amplifies rows by design (that is the operator's job — output
    * size is the mixture's token budget, ~|sources|·maxCnt). Nothing
    * shuffles but the output sort; no stratum ever sorts or windows. */
  def mixtureEpochs(spark: SparkSession, dir: String,
      salt: String = "mix"): DataFrame =
    mixtureEpochsOn(Tables.documents(spark, dir), salt)

  /** [[mixtureEpochs]] over an explicit documents relation. */
  def mixtureEpochsOn(docs: DataFrame, salt: String = "mix"): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
    val mx = counts.agg(max("cnt").as("maxCnt")) // 1 row
    val fac = counts.crossJoin(broadcast(mx))
      .withColumn("factor6", expr("(maxCnt * 1000000L) div cnt"))
      .select(col("source"),
        expr("factor6 div 1000000L").as("epochs"),
        expr("factor6 % 1000000L").as("rem"))
    docs.select("doc_id", "source") // prune the body before any exchange
      .join(broadcast(fac), Seq("source"))
      .withColumn("extra",
        when(md5Long(concat(lit(s"$salt:"), col("doc_id").cast("string")))
          % 1000000L < col("rem"), lit(1L)).otherwise(lit(0L)))
      .withColumn("epoch",
        explode(sequence(lit(0L), col("epochs") + col("extra") - 1)))
      .select(col("doc_id"), col("source"), col("epoch"))
      .orderBy("doc_id", "epoch")
  }

  /** Number of hashed-n-gram feature buckets for [[dsirWeights]] — the
    * whole point of the hashing trick: the distribution tables are
    * FIXED SIZE regardless of corpus size. */
  val DsirBuckets = 8192

  /** q97: DSIR-style importance weights (Xie et al., "Data Selection
    * for Language Models via Importance Resampling", NeurIPS 2023 —
    * public recipe): hash every unigram and adjacent bigram into
    * [[DsirBuckets]] buckets, estimate the target (here: the `lang =
    * refLang` slice) and raw feature distributions over those buckets,
    * and score each document by how much more target-like than
    * raw-like its features are. Output: (doc_id, n_feats,
    * weight_micros) — higher = more target-like; downstream selection
    * is "sample ∝ weight" (the paper) or "keep top-p by weight"
    * (compose with [[sampleByWeights]]).
    *
    * Engine-exact fixed point, the q87 discipline: the paper sums
    * per-feature LOG probability ratios; summing libm logs would tie
    * the gate to float rounding, so each feature occurrence instead
    * contributes the INTEGER smoothed ratio `((ct+1)·1e6) div (cr+1)`
    * (add-one over bucket counts) and the doc score is the exact
    * integer mean — the arithmetic rather than geometric mean of
    * feature ratios, a monotone-enough proxy for rank-and-threshold
    * selection (exactly q87's perplexity trade). The global
    * normalizer (T+B)/(R+B) scales every doc identically and is
    * dropped. Headroom: ct·1e6 holds to ~9·10¹² occurrences of one
    * bucket — thousands of times a Wikipedia-scale target slice.
    *
    * Scale shape (the reason DSIR won at FLAN/pile scale): BOTH
    * distribution tables are ≤ [[DsirBuckets]] rows — corpus-size-
    * independent — built by ONE aggregation over the exploded feature
    * stream (count + count-if-target), then broadcast; scoring is a
    * map-side broadcast join + per-doc sum with map-side combine. At
    * 100 TB nothing corpus-sized ever shuffles: exchanges carry
    * (bucket) ints going up and (doc_id, partial sums) coming down. */
  def dsirWeights(spark: SparkSession, dir: String,
      refLang: String = "en"): DataFrame = {
    val docs = Tables.documents(spark, dir)
    dsirWeightsAgainst(docs, col("lang") === refLang)
  }

  /** [[dsirWeights]] over an explicit relation: `isTarget` marks the
    * target slice (any boolean Column over the relation's columns). */
  def dsirWeightsAgainst(docs: DataFrame,
      isTarget: org.apache.spark.sql.Column): DataFrame = {
    // unigram + adjacent-bigram occurrences, hashed to buckets by the
    // native kernel (ONE tokenize pass off token byte regions — the
    // composed concat/zip_with/md5 chain re-evaluated its tokens()
    // subtree per reference and built every bigram String just to hash
    // it); docs with zero tokens have no features and are absent from
    // the output (nothing to score — the q87 contract)
    val occ = graft.Caches.register(docs
      .select(col("doc_id"), isTarget.as("is_target"),
        explode(org.apache.spark.sql.graft.TextExpressions
          .dsirFeatureBuckets(col("text"), DsirBuckets)).as("bucket"))
      .cache())
    // ONE fixed-size aggregation builds both distributions
    val buckets = occ
      .groupBy("bucket")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
      .withColumn("score6", expr("((ct + 1L) * 1000000L) div (cr + 1L)"))
      .select("bucket", "score6")
    occ
      .join(broadcast(buckets), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        expr("sum(score6) div count(1)").as("weight_micros"))
      .orderBy("doc_id")
  }

  /** Train the DSIR score table as a dense Array indexed by bucket —
    * the fixed-size artifact the map-side scorer
    * ([[graft.streaming.DocStream.curate]]'s `dsirScores` gate /
    * `TextExpressions.dsirScoreMicros`) ships to workers, exactly how
    * [[graft.operators.LangModel.trainModel]] freezes the perplexity
    * model. The collect is [[DsirBuckets]] rows by construction — no
    * cap needed, THE advantage of hashed features over vocabularies.
    * Buckets no corpus feature hit score the add-one-smoothed default
    * `((0+1)·1e6) div (0+1)` = 1e6 — the same formula the aggregation
    * produces for an empty bucket, so scoring a NEW document that hits
    * an untrained bucket stays on the training formula. Scoring the
    * training corpus itself under this table is bit-identical to
    * [[dsirWeightsAgainst]] (spec-pinned). */
  def trainDsir(spark: SparkSession, dir: String,
      refLang: String = "en"): Array[Long] =
    trainDsirOn(Tables.documents(spark, dir), col("lang") === refLang)

  /** [[trainDsir]] over an explicit documents relation with an
    * arbitrary target predicate. */
  def trainDsirOn(docs: DataFrame,
      isTarget: org.apache.spark.sql.Column): Array[Long] = {
    val rows = docs
      .select(isTarget.as("is_target"),
        explode(org.apache.spark.sql.graft.TextExpressions
          .dsirFeatureBuckets(col("text"), DsirBuckets)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
      .withColumn("score6", expr("((ct + 1L) * 1000000L) div (cr + 1L)"))
      .select("bucket", "score6")
      .collect()
    val arr = Array.fill(DsirBuckets)(1000000L)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }
}
