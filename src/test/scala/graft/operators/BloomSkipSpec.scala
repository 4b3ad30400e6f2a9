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

  test("targeted deletion: only candidate files rewritten, the rest " +
    "byte-identical, the key gone, survivors intact, index patched") {
    val delKey = 7L
    val out = s"$layoutPath.spec_forget"
    val report = BloomSkip.deleteKeyFrom(spark, layoutPath, out, delKey)
    // candidate-bounded rewrite: strictly fewer files touched than exist
    assert(report.filesRewritten < report.filesTotal &&
      report.filesTotal == nFiles)
    assert(report.rowsDeleted ==
      orders.where(col("o_custkey") === delKey).count())
    // untouched partitions are BYTE-identical to the source
    val cands = BloomSkip
      .candidateFiles(spark, s"$layoutPath.bloomidx", Seq(delKey)).toSet
    def bytesOf(dir: String, fid: Long): Seq[(String, Long, Long)] =
      Option(new java.io.File(s"$dir/file_id=$fid").listFiles()).toSeq
        .flatten.filter(_.isFile).map { f =>
          val crc = new java.util.zip.CRC32()
          crc.update(java.nio.file.Files.readAllBytes(f.toPath))
          (f.getName, f.length(), crc.getValue)
        }.sortBy(_._1)
    val untouchedFids = (0L until nFiles).filterNot(cands)
    assert(untouchedFids.nonEmpty)
    untouchedFids.foreach { fid =>
      assert(bytesOf(layoutPath, fid) == bytesOf(out, fid),
        s"untouched file_id=$fid changed")
    }
    // the deleted key answers empty THROUGH the patched index; a
    // surviving customer answers exactly as before the deletion
    val post = BloomSkip.lookupIn(spark, out, Seq(delKey, 42L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!post.exists(_._2 == delKey), "deleted key still answers")
    val before = BloomSkip.lookupIn(spark, layoutPath, Seq(42L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(post.toSeq == before.toSeq && before.nonEmpty)
    // the patched index has no false negatives for the remaining data
    val pairs = spark.read.parquet(out)
      .select(col("file_id").cast("long"), col("o_custkey"))
      .distinct().as[(Long, Long)].collect()
    val idx = spark.read.parquet(s"$out.bloomidx")
      .select(col("file_id").cast("long"), col("bitpos"))
      .as[(Long, Long)].collect().toSet
    val missing = pairs.filter { case (f, k) =>
      BloomSkip.probePositions(k).exists(p => !idx((f, p)))
    }
    assert(missing.isEmpty, s"patched index unset bits: ${missing.take(5).toSeq}")
  }

  test("deleting an absent key touches at most fp-bounded files and " +
    "changes no rows") {
    val out = s"$layoutPath.spec_forget_ghost"
    val report = BloomSkip.deleteKeyFrom(spark, layoutPath, out, 10000000L)
    assert(report.rowsDeleted == 0L && report.filesRewritten <= 8)
    assert(spark.read.parquet(out).count() == orders.count())
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
