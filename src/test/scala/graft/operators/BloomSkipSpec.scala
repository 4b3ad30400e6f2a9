package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-file Bloom data-skipping index (q148): lookup correctness vs the
  * plain filter, the no-false-negative construction, fp-bounded pruning
  * for absent keys, and the probe guards. */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = graft.Tables(spark, sf, "orders")
  private lazy val (layoutPath, nFiles) = BloomSkip.layoutCached(spark, sf)

  test("point lookup equals the plain filter, row for row") {
    val keys = Seq(7L, 42L, 133L)
    val got = BloomSkip.pointLookup(spark, sf, keys)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val want = orders.where(col("o_custkey").isin(keys: _*))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == want && want.nonEmpty)
  }

  test("pruning is real and lossless: candidates are a strict subset " +
    "of the layout's files and a superset of the files holding the keys") {
    val keys = Seq(7L, 42L, 133L)
    val cands = BloomSkip
      .candidateFiles(spark, s"$layoutPath.bloomidx", keys).toSet
    // which files actually hold the probe customers' orders
    val truth = spark.read.parquet(layoutPath)
      .where(col("o_custkey").isin(keys: _*))
      .select(col("file_id").cast("long")).distinct()
      .as[Long].collect().toSet
    assert(truth.subsetOf(cands),
      s"false negative: files ${truth -- cands} hold rows but were pruned")
    assert(cands.size < nFiles,
      s"no pruning: ${cands.size} candidates of $nFiles files")
  }

  test("an absent key prunes to fp-bounded candidates and zero rows") {
    val cands = BloomSkip
      .candidateFiles(spark, s"$layoutPath.bloomidx", Seq(10000000L))
    // ~2% fp at the target bits-per-key; tiny files at sf0.001 are even
    // sparser — allow generous slack over the expected ~1 of 64
    assert(cands.size <= 8, s"${cands.size} fp candidates of $nFiles")
    assert(BloomSkip.pointLookup(spark, sf, Seq(10000000L)).count() == 0L)
  }

  test("no false negatives by construction: every stored key's g " +
    "positions are set in its file's filter") {
    val pairs = spark.read.parquet(layoutPath)
      .select(col("file_id").cast("long"), col("o_custkey"))
      .distinct().as[(Long, Long)].collect()
    val idx = spark.read.parquet(s"$layoutPath.bloomidx")
      .select(col("file_id").cast("long"), col("bitpos"))
      .as[(Long, Long)].collect().toSet
    val missing = pairs.filter { case (f, k) =>
      BloomSkip.probePositions(k).exists(p => !idx((f, p)))
    }
    assert(missing.isEmpty, s"unset bits for ${missing.take(5).toSeq}")
  }

  test("probe guards: empty and oversized key lists are refused") {
    intercept[IllegalArgumentException] {
      BloomSkip.pointLookup(spark, sf, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      BloomSkip.pointLookup(spark, sf, (0L to BloomSkip.MaxProbeKeys.toLong))
    }
  }
}
