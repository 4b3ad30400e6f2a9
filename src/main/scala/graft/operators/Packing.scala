package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Sequence packing — the training-example assembly step of an LLM data
  * pipeline: documents are laid out into fixed token-budget bins
  * (context windows), so the trainer reads dense, pre-packed examples
  * instead of padding each document to the window size.
  *
  * Shape (offset packing, the standard streaming approximation): docs
  * are content-addressed into `blocks` independent streams by salted
  * md5 (engine-reproducible, same scheme as [[Sampling]]), ordered
  * deterministically within their block, and a running token prefix-sum
  * assigns `bin = block·2⁴⁰ + start_tok div budget` — a document
  * straddling a boundary belongs to the bin its FIRST token falls in
  * (real pipelines split or truncate at the boundary; exact first-fit
  * is a sequential fold no engine parallelizes). The 2⁴⁰ stride keeps
  * bin ids collision-free up to 2⁴⁰ windows per block (≈2.25e15 tokens
  * at the default budget — comfortably past a 100 TB corpus) and 2²³
  * blocks before the Long overflows.
  *
  * Scale: the only shuffles are the per-block window and the output
  * sort. Parallelism = `blocks` — at 100 TB you raise `blocks` to a
  * multiple of the cluster's cores and every block packs independently;
  * there is no global order and no single-partition window. The window
  * carries (doc_id, n_tokens, block) — never the text.
  */
object Packing {

  /** Per-block bin-id stride (2⁴⁰). Shared with the q59 oracle SQL. */
  val BinStride: Long = 1L << 40

  def pack(spark: SparkSession, dir: String, budget: Int = 2048,
      blocks: Int = 8, salt: String = "pack"): DataFrame =
    packRelation(spark, dir, budget, blocks, salt).orderBy("doc_id")

  /** [[pack]] without the presentation sort — the manifest relation a
    * storage layout materializes (the doc-takedown bundle partitions it
    * by block; a sort before a repartition would be wasted work). */
  private[operators] def packRelation(spark: SparkSession, dir: String,
      budget: Int = 2048, blocks: Int = 8,
      salt: String = "pack"): DataFrame = {
    require(budget > 0 && blocks > 0, "budget and blocks must be positive")
    require(blocks.toLong < (1L << 23), "blocks must fit the bin-id stride")
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        pmod(md5Long(concat(lit(s"$salt:"), col("doc_id").cast("string"))),
          lit(blocks.toLong)).as("block"))
    val w = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("start_tok", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("bin",
        col("block") * lit(BinStride) + expr(s"start_tok div $budget"))
      .select("doc_id", "block", "n_tokens", "start_tok", "bin")
  }

  /** Span-level packing — what the shard writer actually emits: a doc
    * whose tokens straddle window boundaries is SPLIT, one row per
    * (doc, bin) with the doc-relative token range `[tok_from, tok_to)`
    * that lands in that bin. Every bin is exactly `budget` tokens except
    * each block's last; [[pack]]'s whole-doc rows are the `tok_from = 0`
    * spans of this relation. Zero-token docs occupy no space in any
    * shard and emit no span.
    *
    * Same two shuffles as [[pack]] (per-block window + output sort) —
    * the span explode is map-side `sequence()` arithmetic over the
    * prefix sums, ≤ ⌈n_tokens/budget⌉+1 rows per doc. */
  def packSpans(spark: SparkSession, dir: String, budget: Int = 2048,
      blocks: Int = 8, salt: String = "pack"): DataFrame = {
    require(budget > 0 && blocks > 0, "budget and blocks must be positive")
    require(blocks.toLong < (1L << 23), "blocks must fit the bin-id stride")
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        pmod(md5Long(concat(lit(s"$salt:"), col("doc_id").cast("string"))),
          lit(blocks.toLong)).as("block"))
    val w = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("start_tok", sum("n_tokens").over(w) - col("n_tokens"))
      .where(col("n_tokens") > 0)
      .select(col("doc_id"), col("block"), col("start_tok"), col("n_tokens"),
        explode(sequence(
          expr(s"start_tok div $budget"),
          expr(s"(start_tok + n_tokens - 1) div $budget"))).as("win"))
      .select(col("doc_id"),
        (col("block") * lit(BinStride) + col("win")).as("bin"),
        (greatest(col("start_tok"), col("win") * budget) - col("start_tok"))
          .as("tok_from"),
        (least(col("start_tok") + col("n_tokens"),
          (col("win") + 1) * budget) - col("start_tok")).as("tok_to"))
      .orderBy("doc_id", "bin")
  }
}
