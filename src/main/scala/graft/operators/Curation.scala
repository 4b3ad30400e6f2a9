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
}
