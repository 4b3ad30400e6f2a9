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

  /** Run `body` and return (result, number of Spark jobs it started).
    * The listener bus is async — wait until the count stops moving. */
  private def countJobs[A](body: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val a = body
      var last = -1
      while (n.get != last) { last = n.get; Thread.sleep(200) }
      (a, n.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

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
    "SHARED via the manifest, the key gone, survivors intact, index " +
    "patched") {
    val delKey = 7L
    val out = s"$layoutPath.spec_forget"
    val report = BloomSkip.deleteKeyFrom(spark, layoutPath, out, delKey)
    // candidate-bounded rewrite: strictly fewer files touched than exist
    assert(report.filesRewritten < report.filesTotal &&
      report.filesTotal == nFiles)
    assert(report.filesShared == report.filesTotal - report.filesRewritten)
    assert(report.rowsDeleted ==
      orders.where(col("o_custkey") === delKey).count())
    // untouched files are SHARED: the same physical path in both
    // manifests (a manifest row, not a copy), and the new version's
    // directory physically holds ONLY rewritten candidate files
    val cands = BloomSkip
      .candidateFiles(spark, s"$layoutPath.bloomidx", Seq(delKey)).toSet
    val mfSrc = BloomSkip.manifestOf(spark, layoutPath)
    val mfOut = BloomSkip.manifestOf(spark, out)
    val shared = mfOut.filterNot { case (fid, _) => cands(fid) }
    assert(shared.nonEmpty)
    shared.foreach { case (fid, p) =>
      assert(p == mfSrc(fid), s"untouched file_id=$fid copied, not shared")
    }
    val ownDirs = Option(new java.io.File(out).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("file_id="))
      .map(_.getName.stripPrefix("file_id=").toLong).toSet
    assert(ownDirs.subsetOf(cands),
      s"non-candidate files materialized in the new version: " +
        s"${ownDirs -- cands}")
    // the deleted key answers empty THROUGH the patched index; a
    // surviving customer answers exactly as before the deletion
    val post = BloomSkip.lookupIn(spark, out, Seq(delKey, 42L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!post.exists(_._2 == delKey), "deleted key still answers")
    val before = BloomSkip.lookupIn(spark, layoutPath, Seq(42L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(post.toSeq == before.toSeq && before.nonEmpty)
    // the patched index has no false negatives for the remaining data
    // (read the version THROUGH its manifest — shared files included)
    val pairs = BloomSkip.readFiles(spark, out)
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

  test("batched erasure (q153): K keys cost the SAME job count as one " +
    "key, touch only the union-candidate files, and delete exactly " +
    "the batch") {
    val delKeys = Seq(7L, 13L, 29L)
    // warm the manifest memo so both measured runs pay identical reads
    BloomSkip.manifestOf(spark, layoutPath)
    val (_, jobs1) = countJobs {
      BloomSkip.deleteKeysFrom(spark, layoutPath,
        s"$layoutPath.spec_batch1", Seq(7L))
    }
    val (reportK, jobsK) = countJobs {
      BloomSkip.deleteKeysFrom(spark, layoutPath,
        s"$layoutPath.spec_batchK", delKeys)
    }
    // the data rewrite is ONE write action; AQE materializes its
    // exchanges as separate scheduler jobs, so the hard invariant is
    // that the TOTAL job count is independent of K and of the
    // candidate-set size (K=3 unions ~3x the candidate files) — the
    // old driver loop ran 3 jobs PER candidate directory
    assert(jobsK == jobs1,
      s"job count must not scale with K or candidates: K=3 ran $jobsK " +
        s"jobs vs K=1's $jobs1")
    assert(jobsK <= 20, s"erasure ran $jobsK jobs — not a bounded pipeline")
    // exact deletion accounting: the batch deletes the sum of its keys
    assert(reportK.rowsDeleted ==
      orders.where(col("o_custkey").isin(delKeys: _*)).count())
    // the rewrite touched exactly the union-candidate set
    val cands = BloomSkip
      .candidateFiles(spark, s"$layoutPath.bloomidx", delKeys).toSet
    assert(reportK.filesRewritten == cands.size &&
      cands.size < reportK.filesTotal)
    // all K keys gone, survivors intact, through the patched index
    val outK = s"$layoutPath.spec_batchK"
    val post = BloomSkip.lookupIn(spark, outK, delKeys :+ 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!post.exists(r => delKeys.contains(r._2)),
      "a batched key still answers")
    val before = BloomSkip.lookupIn(spark, layoutPath, Seq(42L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(post.toSeq == before.toSeq && before.nonEmpty)
    // non-candidates shared with the source version
    val mfSrc = BloomSkip.manifestOf(spark, layoutPath)
    val mfOut = BloomSkip.manifestOf(spark, outK)
    mfOut.filterNot { case (fid, _) => cands(fid) }.foreach {
      case (fid, p) => assert(p == mfSrc(fid),
        s"untouched file_id=$fid copied, not shared")
    }
  }

  test("erasure is NULL-safe: a NULL-keyed row in a candidate file " +
    "survives the rewrite and is not counted as deleted") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("bloomnull").toString + "/layout"
    // o_orderkey 1 and 65 land in the SAME file (1 mod 64) — the NULL
    // row shares a candidate file with the deleted key
    val df = Seq(
      (1L, Option(5L), 1.0), (65L, Option.empty[Long], 2.0),
      (2L, Option(9L), 3.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    BloomSkip.bloomWrite(df, "o_custkey", "o_orderkey", dir)
    val out = s"$dir.forget"
    val report = BloomSkip.deleteKeysFrom(spark, dir, out, Seq(5L))
    assert(report.rowsDeleted == 1L,
      s"exactly the keyed row deletes, got ${report.rowsDeleted}")
    val left = BloomSkip.readFiles(spark, out)
      .select("o_orderkey").as[Long].collect().toSet
    assert(left == Set(65L, 2L),
      s"the NULL-keyed row must survive an erasure, got $left")
  }

  test("deleting an absent key touches at most fp-bounded files and " +
    "changes no rows") {
    val out = s"$layoutPath.spec_forget_ghost"
    val report = BloomSkip.deleteKeyFrom(spark, layoutPath, out, 10000000L)
    assert(report.rowsDeleted == 0L && report.filesRewritten <= 8)
    assert(BloomSkip.readFiles(spark, out).count() == orders.count())
  }

  test("q157 composed lookup: the scanned file set IS the bloom ∩ " +
    "minmax intersection, strictly smaller than either index alone, " +
    "and the rows equal the plain conjunctive filter") {
    val keys = Seq(7L, 42L)
    val (from, to) = ("1995-01-01", "1996-06-30")
    val df = BloomSkip.lookupKeysInRange(spark, sf, keys, from, to)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val path = BloomSkip.dateLayoutCached(spark, sf)
    val bloomC = BloomSkip
      .candidateFiles(spark, s"$path.bloomidx", keys).toSet
    val dateC = BloomSkip
      .dateCandidateFiles(spark, s"$path.minmax", from, to).toSet
    val inter = bloomC.intersect(dateC)
    // the AND prunes strictly harder than either index alone: bloom
    // candidates span the customers' multi-year history, date
    // candidates span every customer of the window
    assert(inter.nonEmpty && inter.size < bloomC.size &&
      inter.size < dateC.size,
      s"bloom ${bloomC.size} ∩ date ${dateC.size} = ${inter.size}")
    // the scan LISTED exactly the intersection's directories
    val listedFids = df.inputFiles.toSeq
      .flatMap(f => "file_id=(\\d+)".r.findFirstMatchIn(f)
        .map(_.group(1).toLong)).toSet
    assert(listedFids == inter, s"scanned $listedFids, want $inter")
    // and the answer is the plain conjunctive filter, row for row
    val want = orders
      .where(col("o_custkey").isin(keys: _*) &&
        col("o_orderdate").cast("date").between(
          lit(from).cast("date"), lit(to).cast("date")))
      .select(col("o_orderkey"), col("o_custkey")).orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && want.nonEmpty)
  }

  test("q159 erasure through the composed layout: both indexes " +
    "patched, deleted keys gone through the intersected probe, " +
    "survivors and untouched stats intact") {
    val delKeys = Seq(7L, 42L)
    val src = BloomSkip.dateLayoutCached(spark, sf)
    val out = s"$src.spec_dforget"
    val report = BloomSkip.deleteKeysFromDated(spark, src, out, delKeys)
    assert(report.rowsDeleted ==
      orders.where(col("o_custkey").isin(delKeys: _*)).count() &&
      report.rowsDeleted > 0)
    // the min/max stats patched: untouched files' rows IDENTICAL,
    // rewritten files' rows equal a recompute from the surviving data
    val oldStats = spark.read.parquet(s"$src.minmax")
      .select(col("file_id").cast("long"), col("dmin"), col("dmax"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    val newStats = spark.read.parquet(s"$out.minmax")
      .select(col("file_id").cast("long"), col("dmin"), col("dmax"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    val rewritten = Layouts.listFileDirs(new java.io.File(out)).keySet
    val mfOut = BloomSkip.manifestOf(spark, out)
    assert(newStats.keySet == mfOut.keySet,
      "stats rows must track the manifest exactly")
    (newStats.keySet -- rewritten).foreach { f =>
      assert(newStats(f) == oldStats(f), s"untouched stats moved: $f")
    }
    val recomputed = BloomSkip.readFiles(spark, out)
      .where(col("file_id").cast("long").isin(rewritten.toSeq: _*))
      .groupBy(col("file_id").cast("long").as("f"))
      .agg(min("o_orderdate").as("dmin"), max("o_orderdate").as("dmax"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    rewritten.foreach { f =>
      assert(newStats(f) == recomputed(f), s"stale stats for $f")
    }
    // the probe through the patched version: deleted keys absent,
    // survivors exactly the plain conjunctive filter
    val (from, to) = ("1995-01-01", "1996-06-30")
    val got = BloomSkip
      .lookupKeysInRangeIn(spark, out, delKeys ++ Seq(13L, 133L), from, to)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!got.exists(r => delKeys.contains(r._2)))
    val want = orders
      .where(col("o_custkey").isin(13L, 133L) &&
        col("o_orderdate").cast("date").between(
          lit(from).cast("date"), lit(to).cast("date")))
      .select(col("o_orderkey"), col("o_custkey")).orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && want.nonEmpty)
  }

  test("q160 vacuum: pre-forget snapshot expires, shared files " +
    "survive, the retained read stays exact, and NO deleted byte " +
    "remains anywhere in the lineage") {
    import java.nio.file.Files
    val delKeys = Seq(7L, 13L)
    val base = Files.createTempDirectory("vaclineage").toString
    val (v1, v2, log) = (s"$base/v1", s"$base/v2", s"$base/log")
    BloomSkip.bloomWrite(orders
      .select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", "o_orderkey", v1)
    Layouts.commitVersion(log, v1)
    BloomSkip.deleteKeysFrom(spark, v1, v2, delKeys)
    Layouts.commitVersion(log, v2)
    val cands = BloomSkip
      .candidateFiles(spark, s"$v1.bloomidx", delKeys).toSet
    val report = Layouts.vacuum(spark, log, keepLast = 1)
    // exactly v1 expired; its candidate files (the only ones v2 does
    // NOT share) deleted; everything v2 references survived
    assert(report.versionsExpired == 1L)
    assert(report.filesDeleted == cands.size.toLong, s"$report")
    val mf2 = Layouts.manifestOf(spark, v2)
    assert(report.filesShared == (mf2.size - Layouts
      .listFileDirs(new java.io.File(v2)).size).toLong)
    mf2.values.foreach(p => assert(new java.io.File(p).exists(),
      s"vacuum deleted a retained file: $p"))
    assert(!new java.io.File(s"$v1.bloomidx").exists() &&
      !new java.io.File(Layouts.manifestPath(v1)).exists(),
      "expired sidecars survived")
    // the retained read is still exact
    val got = BloomSkip.lookupIn(spark, v2, delKeys :+ 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = orders.where(col("o_custkey") === 42L)
      .select(col("o_orderkey"), col("o_custkey")).orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && want.nonEmpty)
    // COMPLIANCE SWEEP: no parquet file left anywhere under the
    // lineage holds a deleted key's row — the bytes are gone, not
    // merely unreferenced
    def parquets(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.flatMap(parquets)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    val dataFiles = parquets(new java.io.File(base))
      .filterNot(f => f.getAbsolutePath.contains(".bloomidx") ||
        f.getAbsolutePath.contains(".manifest"))
    assert(dataFiles.nonEmpty)
    val leftovers = spark.read
      .parquet(dataFiles.map(_.getAbsolutePath): _*)
      .where(col("o_custkey").isin(delKeys: _*)).count()
    assert(leftovers == 0L,
      s"$leftovers deleted-key rows still physically on disk")
    // a second vacuum is a no-op
    assert(Layouts.vacuum(spark, log, keepLast = 1) ==
      Layouts.VacuumReport(0L, 0L, 0L))
  }

  test("time travel: as-of reads serve each snapshot exactly until " +
    "vacuum expires it — then they fail LOUDLY, never partially") {
    import java.nio.file.Files
    val delKeys = Seq(7L)
    val base = Files.createTempDirectory("vactt").toString
    val (v1, v2, log) = (s"$base/v1", s"$base/v2", s"$base/log")
    BloomSkip.bloomWrite(orders
      .select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", "o_orderkey", v1)
    Layouts.commitVersion(log, v1)
    BloomSkip.deleteKeysFrom(spark, v1, v2, delKeys)
    Layouts.commitVersion(log, v2)
    val nAll = orders.count()
    val nDel = orders.where(col("o_custkey").isin(delKeys: _*)).count()
    // the pre-forget snapshot still shows the user; the post-forget
    // snapshot never does — both reads through their own manifests
    assert(Layouts.readAsOf(spark, log, 1L).count() == nAll)
    assert(Layouts.readAsOf(spark, log, 1L)
      .where(col("o_custkey").isin(delKeys: _*)).count() == nDel &&
      nDel > 0)
    assert(Layouts.readAsOf(spark, log, 2L).count() == nAll - nDel)
    // retention: vacuum expires v1 — as-of 1 now fails loudly with
    // the live-version list, as-of 2 is untouched
    Layouts.vacuum(spark, log, keepLast = 1)
    val e = intercept[IllegalArgumentException] {
      Layouts.readAsOf(spark, log, 1L)
    }
    assert(e.getMessage.contains("expired") &&
      e.getMessage.contains("live: 2"), e.getMessage)
    assert(Layouts.readAsOf(spark, log, 2L).count() == nAll - nDel)
    // an uncommitted version id is the same loud failure
    intercept[IllegalArgumentException] {
      Layouts.readAsOf(spark, log, 99L)
    }
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
