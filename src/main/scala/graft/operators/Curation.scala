package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** The composed training-data curation pass — the pipeline the individual
  * operators exist for, as one declarative plan Catalyst optimizes
  * end-to-end:
  *
  *   1. exact dedup: keep the lowest doc_id per canonical fingerprint
  *      (window rank on the fp — one shuffle);
  *   2. quality gate: composite quality score ≥ `minQuality` (map-only,
  *      rides the same stage);
  *   3. per-language quota: deterministic hash-rank ≤ `quotaPerLang`
  *      (data mixing — one shuffle on the stratum key).
  *
  * Each stage's semantics is individually oracle-verified (q16, q20,
  * q48); this composition is itself hash-verified as q50. At 100 TB the
  * same plan holds: two shuffles total, everything else rides the scan.
  */
object Curation {

  def curate(spark: SparkSession, dir: String, minQuality: Double = 0.5,
      quotaPerLang: Int = 100, salt: String = "curate"): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // fp AND quality in the scan-side projection, then `text` is DROPPED:
    // the fp-window shuffle carries only (doc_id, lang, fp, quality) —
    // ~50 B/row instead of the document body, which at 100 TB is the
    // difference between shuffling the corpus and shuffling a key table.
    // quality is a single-fold expression (see TextFunctions.qualityScore)
    // evaluated exactly once per doc here; downstream filters reference
    // the materialized column, and the quality predicate cannot be pushed
    // below the window (not a partition key), so it is never re-derived
    // from text. Semantics unchanged: dedup picks keepers by (fp, doc_id)
    // alone, THEN the quality gate applies to keepers.
    val keepers = docs
      .select(col("doc_id"), col("lang"),
        fingerprint(col("text")).as("fp"),
        qualityScore(col("text")).as("quality"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("fp").orderBy("doc_id")))
      .where(col("rn") === 1)
    keepers
      .where(col("quality") >= minQuality)
      .withColumn("rk", Sampling.hashRank("lang", salt))
      .where(col("rk") <= quotaPerLang)
      .select("doc_id", "lang", "quality", "rk")
      .orderBy("doc_id")
  }

  /** Near-dup canonical selection — the decision a dedup pipeline
    * actually ships: for every near-dup cluster (MinHash-LSH pairs →
    * connected components, the q24/q53 machinery) keep exactly ONE
    * member, the highest-quality document (ties → lowest doc_id);
    * unclustered documents are their own cluster and keep themselves.
    * Output: every doc with (comp, quality, keep ∈ {0,1}).
    *
    * Scale: the component labels are pair-derived (tiny next to the
    * corpus); the corpus side joins and windows on (doc_id, quality) —
    * the text never leaves the scan stage. Cluster groups are near-dup
    * sets, so the keep-window partitions are small by construction. */
  def canonicalDocs(spark: SparkSession, dir: String): DataFrame = {
    val comps = Dedup.connectedComponents(
      Dedup.minhashLshPairs(spark, dir, ordered = false))
    val q = Tables.documents(spark, dir)
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))
    q.join(comps, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
      .withColumn("keep",
        when(row_number().over(Window.partitionBy("comp")
          .orderBy(desc("quality"), col("doc_id"))) === 1, lit(1))
          .otherwise(lit(0)))
      .select("doc_id", "comp", "quality", "keep")
      .orderBy("doc_id")
  }

  /** Corpus report card — the audit rollup every curation run publishes:
    * per (source, lang) document and token totals, exact-duplicate
    * count, mean quality, and PII incidence. ONE corpus scan computes
    * every per-doc signal (tokens, fixed-point quality, fingerprint,
    * PII flag) in the same projection, then one aggregation rolls them
    * up — at 100 TB the shuffle carries ~60 B/row key signals, never
    * text, and the output is |sources|×|langs| rows.
    *
    * Determinism discipline: every aggregate is an INTEGER sum/count
    * (fixed-point basis-point quality, the q64 trick), so no
    * double-accumulation order can flip the hash gate; the one division
    * (mean quality) happens once per GROUP on exact integer inputs. */
  def corpusReport(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        tokenCount(col("text")).cast("long").as("n_toks"),
        floor(qualityScore(col("text")) * 10000 + lit(0.5))
          .cast("long").as("q_bp"),
        md5(col("text")).as("fp"),
        ((regexp_count(col("text"), lit(Pii.EmailRe))
          + regexp_count(col("text"), lit(Pii.Ipv4Re))
          + regexp_count(col("text"), lit(Pii.PhoneRe))) > 0)
          .cast("long").as("pii"))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum("n_toks").as("total_tokens"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"),
        floor(sum("q_bp") / count(lit(1)) + lit(0.5)).cast("long")
          .as("mean_quality_bp"),
        sum("pii").as("n_pii_docs"))
      .orderBy("source", "lang")

  /** Curriculum bucketing: every document stamped with its quality
    * decile (1 = top) so a training loader can schedule easy/clean
    * buckets first. Deliberately NOT `ntile` — a global window without
    * a partition key collapses the corpus into ONE task at scale. Here
    * the decile CUTOFFS are a 9-value exact-percentile aggregate
    * (linear-interpolated rank, = DuckDB quantile_cont, the q49
    * parity), broadcast as one row; assignment is then map-side —
    * the same cutoffs-broadcast shape as the IVF centroid assign.
    * Ties share a decile by construction (strict `>` against each
    * cutoff), so the stamp is deterministic without a doc_id
    * tiebreak. */
  def curriculum(spark: SparkSession, dir: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "curriculum needs at least 2 buckets")
    val q = Tables.documents(spark, dir)
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))
    val cuts = q.agg(
      percentile(col("quality"), lit(1.0 / buckets)).as("c1"),
      (2 until buckets).map(i =>
        percentile(col("quality"), lit(i.toDouble / buckets)).as(s"c$i")): _*)
    val above = (1 until buckets)
      .map(i => when(col("quality") > col(s"c$i"), 1).otherwise(0))
      .reduce(_ + _)
    q.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("quality"),
        (lit(buckets) - above).as("decile"))
      .orderBy("doc_id")
  }
}
