package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× data amplifier for scale-validation runs.
  *
  * Reads one scale-factor directory and writes `factor`× the rows with
  * referential integrity preserved: every key family (custkey, orderkey,
  * partkey, suppkey, event/user ids, doc/vec ids) is offset by
  * `replica * stride`, where the stride is the smallest power of ten
  * above the base table's max key. Replica 0 is the base data unchanged,
  * and a foreign key always lands in its own replica's dimension row, so
  * every join in the suite sees a 10× fact AND 10× dim world — exactly
  * the shape a real scale-up would present (region/nation stay fixed,
  * as in TPC-H).
  *
  * Two columns get more than a key shift, both deliberately:
  *  - `documents.text`: each replica k>0 injectively remaps `remapPct`%
  *    of the token vocabulary (token → `token_k`, chosen by
  *    crc32(token#k) — a function of the TOKEN, not the doc). Docs that
  *    are exact or near duplicates of each other WITHIN a replica stay
  *    exactly as similar (an injective vocabulary remap preserves set
  *    relations on tokens and on shingles alike), while cross-replica
  *    copies of the same doc fall far below every near-dup threshold
  *    (at the default 50%, a 5-gram shingle survives unremapped with
  *    p ≈ 0.5⁵ ≈ 3% → Jaccard ≈ 0.016). Without this, every doc would
  *    gain factor−1 artificial near-dups and the pair-generating dedup
  *    queries would measure a quadratic blow-up that a real 10× corpus
  *    does not have. See [[run]] for the remapPct semantics.
  *  - `embeddings.embedding`: ±0.02 deterministic per-(vec, replica,
  *    dim) jitter so ANN top-k measures a 10× corpus rather than
  *    10-way ties between exact copies.
  *
  * The amplifier itself is scale-grade: each table is one broadcast
  * cross join with the replica ids (map-only, zero shuffles) and the
  * only driver-side values are per-family max-key aggregates.
  *
  * Usage: `runMain graft.ScaleUp <baseDir> <outDir> [factor]`
  */
object ScaleUp {

  /** Smallest power of ten strictly above the column's max — keeps
    * offset keys readable (replica = leading digits) and collision-free. */
  private def stride(df: DataFrame, key: String): Long = {
    val m = df.agg(max(col(key)).cast("long")).head.getLong(0)
    var s = 1L
    while (s <= m) s *= 10
    s
  }

  private def shifted(c: String, s: Long): Column =
    (col(c) + col("k") * lit(s)).as(c)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleUp <baseDir> <outDir> [factor] [remapPct]")
    val (base, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val remapPct = if (args.length > 3) args(3).toInt else 50
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, base, out, factor, remapPct)
    spark.stop()
  }

  /** `remapPct` tunes how much cross-replica text overlap survives — the
    * skew knob of the amplifier. 50 (default) models INDEPENDENT corpus
    * growth: unigram vocab overlap 1/3, 5-gram shingle survival 0.5⁵ ≈
    * 3% — replica copies share vocabulary but essentially no shingles,
    * like genuinely new content. 30 models a NEAR-DUP-HEAVY corpus:
    * 5-gram survival 17%, 3-gram 34% — every doc drags a tail of
    * partial copies, the shape that stresses candidate-generation skew
    * in the similarity-join family. */
  def run(spark: SparkSession, base: String, out: String,
      factor: Int, remapPct: Int = 50): Unit = {
    val replicas = broadcast(
      spark.range(factor).select(col("id").cast("int").as("k")))
    def t(name: String) = Tables(spark, base, name)
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name x$factor written")
    }

    // fixed dims: copy (TPC-H keeps region/nation constant across sf)
    write("region", t("region"))
    write("nation", t("nation"))

    val sCust = stride(t("customer"), "c_custkey")
    val sSupp = stride(t("supplier"), "s_suppkey")
    val sPart = stride(t("part"), "p_partkey")
    val sOrd  = stride(t("orders"), "o_orderkey")
    val sEvt  = stride(t("events"), "event_id")
    val sUser = stride(t("events"), "user_id")
    val sDoc  = stride(t("documents"), "doc_id")
    val sVec  = stride(t("embeddings"), "vec_id")

    def amplified(name: String, keyed: DataFrame => DataFrame): DataFrame =
      keyed(t(name).crossJoin(replicas))

    write("customer", amplified("customer", df => df.select(
      shifted("c_custkey", sCust), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"))))
    write("supplier", amplified("supplier", df => df.select(
      shifted("s_suppkey", sSupp), col("s_name"), col("s_nationkey"),
      col("s_acctbal"))))
    write("part", amplified("part", df => df.select(
      shifted("p_partkey", sPart), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice"))))
    write("orders", amplified("orders", df => df.select(
      shifted("o_orderkey", sOrd), shifted("o_custkey", sCust),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"))))
    write("lineitem", amplified("lineitem", df => df.select(
      shifted("l_orderkey", sOrd), shifted("l_partkey", sPart),
      shifted("l_suppkey", sSupp), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))))
    // raw read keeps `ts` as Long nanos (nanosAsLong) — written back as
    // BIGINT, which Tables.events normalizes identically on read
    write("events", amplified("events", df => df.select(
      shifted("event_id", sEvt), col("ts"), shifted("user_id", sUser),
      col("event_type"), col("value"), col("props"))))

    // remapPct% per-replica vocabulary remap; decision is crc32(token#k)
    // so identical texts stay identical within a replica
    val remapTok = (tok: Column) => when(
      crc32(concat(tok, lit("#"), col("k"))) % 100 < remapPct,
      concat(tok, lit("_"), col("k"))).otherwise(tok)
    val remappedText = when(col("k") === 0, col("text")).otherwise(
      concat_ws(" ", transform(split(col("text"), " "), remapTok)))
    write("documents", amplified("documents", df => df
      .withColumn("text", remappedText)
      .select(shifted("doc_id", sDoc), col("text"), col("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))))

    // ±0.02 deterministic jitter per (vec, replica, dim) on k>0
    val jittered = when(col("k") === 0, col("embedding")).otherwise(
      transform(col("embedding"), (x, i) => (x +
        (crc32(concat(col("vec_id").cast("string"), lit("_"), col("k"),
          lit("_"), i.cast("string"))) % 1000 - 500).cast("double")
          / 25000.0).cast("float")))
    write("embeddings", amplified("embeddings", df => df
      .withColumn("embedding", jittered)
      .select(shifted("vec_id", sVec), col("embedding"), col("label"))))
  }
}
