package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.md5LongScala

/** Per-file Bloom data-skipping index — point-lookup pruning on a
  * high-cardinality column whose values scatter across every file of a
  * layout (the case neither z-order nor min/max footer stats can help:
  * a hash-distributed key has every file's [min, max] spanning the
  * whole domain). The Delta/Iceberg answer is a Bloom filter per file
  * (Delta bloom filter indexes, Iceberg puffin blobs); ours keeps the
  * engine's relational discipline: the index IS a relation
  * `(file_id, bitpos)` — the distinct set bits of each file's filter —
  * built map-side in one pass (project → explode g positions →
  * distinct), mergeable by plain union-distinct (append N new files =
  * append their rows), and PROBED with one equi-join: a key's g
  * positions join the index and a file is a candidate iff all g match.
  * False positives cost only extra files scanned (the exact predicate
  * re-applies after the prune — a bug fails loudly against the plain
  * oracle, never silently); false negatives are impossible by
  * construction (every stored key set its bits).
  *
  * Scale story (the reason this exists at 100 TB): a point lookup on
  * `o_custkey` without the index scans EVERY file — the layout is
  * keyed by arrival (`o_orderkey % nFiles`), so no partition predicate
  * applies. With the index, a customer's ~10 orders live in ≤ 10 of
  * the layout's files and the scan touches candidates only: the prune
  * factor GROWS with the corpus (files scale with volume at a fixed
  * target file size; a key's file spread stays its row count). The
  * index itself stays O(bits-per-key · keys) rows, partitionable by
  * file_id, and the probe join touches only the g·|keys| bit positions
  * requested (predicate pushdown on `bitpos`).
  *
  * No reference counterpart (north-star extension): the reference's
  * only point lookup is the ES docvalue fetch (SURVEY §2.7 A4), which
  * delegates skipping to Lucene's terms index. */
object BloomSkip {

  /** Bits per file filter: 2^18 = 32 KiB dense. At the 25k-row target
    * file size that is ≥ 10 bits/key — ~2% false-positive rate at
    * g = 2, CONSTANT across scale factors because files split to hold
    * row count, not the other way around. */
  val BloomBits: Int = 1 << 18

  /** Hash functions per key. */
  val GHashes: Int = 2

  /** Target rows per layout file: files scale with volume, so
    * bits-per-key (hence the fp rate) is scale-invariant. */
  val TargetRowsPerFile: Long = 25000L

  /** Floor on the file count — pruning needs many files relative to a
    * key's spread even at tiny test scale. */
  val MinFiles: Long = 64L

  /** The g bit positions of one key — engine-side column form. Hash
    * h_i = md5-60("bf<i>:" + key) mod bits (the shared md5-60
    * convention; [[probePositions]] is the driver-side twin, so build
    * and probe always agree). */
  private def bitposCols(key: Column, bits: Int): Seq[Column] =
    (0 until GHashes).map(i =>
      conv(substring(md5(concat(lit(s"bf$i:"), key.cast("string"))),
        1, 15), 16, 10).cast("long") % bits)

  /** Driver-side twin of [[bitposCols]] for probe keys. */
  def probePositions(key: Long, bits: Int = BloomBits): Seq[Long] =
    (0 until GHashes).map(i => md5LongScala(s"bf$i:$key") % bits)

  /** Build the index relation over a written layout: one row per
    * (file_id, set bit). ONE pass: distinct keys per file → explode g
    * positions → distinct. Output is ≤ min(bits, g·keys) rows per file
    * and unions across file batches (append-friendly). */
  def bloomIndexOn(layout: DataFrame, keyCol: String,
      bits: Int = BloomBits): DataFrame = {
    val pos = bitposCols(col(keyCol), bits)
    layout.select(col("file_id"), col(keyCol)).distinct()
      .select(col("file_id"), explode(array(pos: _*)).as("bitpos"))
      .distinct()
  }

  /** Write `df` as an arrival-keyed layout (`file_id = fileKey mod
    * nFiles` partitions — deterministic under any partitioning, no
    * sort) plus its Bloom index relation at `<outDir>.bloomidx`.
    * nFiles targets [[TargetRowsPerFile]] so the per-file key count —
    * and with it the fp rate — is the same at sf0.001 and sf100. */
  def bloomWrite(df: DataFrame, keyCol: String, fileKeyCol: String,
      outDir: String, bits: Int = BloomBits): Long = {
    val n = df.count()
    val nFiles = math.max(MinFiles, (n + TargetRowsPerFile - 1) /
      TargetRowsPerFile)
    df.withColumn("file_id", col(fileKeyCol) % nFiles)
      .repartition(col("file_id"))
      .write.mode("overwrite").partitionBy("file_id").parquet(outDir)
    val spark = df.sparkSession
    bloomIndexOn(spark.read.parquet(outDir), keyCol, bits)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$outDir.bloomidx")
    nFiles
  }

  private val layoutMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Long), (String, Long)]

  /** Forget memoized bloom layouts (tests, cold benching). */
  def clearMemos(): Unit = { layoutMemo.clear(); forgetMemo.clear() }

  /** The materialized bloom-indexed layout of the `orders` table for
    * `dir`: built on first request, fingerprint-keyed for the JVM
    * lifetime (the [[Warehouse.zlayoutCached]] discipline — a refresh
    * writes NEW directories and retires the old pair to the deferred
    * reaper). Returns (layout path, nFiles). */
  def layoutCached(spark: SparkSession, dir: String): (String, Long) = {
    val fp = IvfIndex.dataFingerprint(dir, table = "orders")
    val key = (dir, fp)
    val v = layoutMemo.getOrElseUpdate(key, {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val p = sys.props("java.io.tmpdir") +
        s"/graft-bloomlayout-$tag-f${java.lang.Long.toHexString(fp)}"
      val nFiles = bloomWrite(graft.Tables(spark, dir, "orders"),
        "o_custkey", "o_orderkey", p)
      (p, nFiles)
    })
    val stale = layoutMemo.keys
      .filter(k => k._1 == dir && k != key)
      .flatMap(layoutMemo.remove).flatMap(x =>
        Seq(x._1, s"${x._1}.bloomidx")).toSeq
    graft.IndexGc.retire(s"bloomlayout:$dir", stale)
    v
  }

  /** Probe cap: a point-lookup API, not a bulk semi-join (that path is
    * a broadcast join against the table itself). */
  val MaxProbeKeys: Int = 1024

  /** The files that may contain any of `keys`, per the index: build
    * the (key, gidx, bitpos) probe relation driver-side (g·|keys|
    * rows), equi-join the index on `bitpos` (pushed to the scan), and
    * keep files matching ALL g positions of at least one key. Result
    * is driver-sized: ≤ |keys| · (spread + fp·nFiles) file ids. */
  def candidateFiles(spark: SparkSession, idxPath: String,
      keys: Seq[Long], bits: Int = BloomBits): Seq[Long] =
    candidateFilesOn(spark.read.parquet(idxPath), keys, bits)

  /** [[candidateFiles]] over an explicit index relation — also the
    * probe stage of the STREAMED index
    * ([[graft.streaming.BloomStream]]), whose index is a union of
    * epoch partials rather than one file. */
  def candidateFilesOn(idx: DataFrame, keys: Seq[Long],
      bits: Int = BloomBits): Seq[Long] = {
    val spark = idx.sparkSession
    import spark.implicits._
    val probeRows = keys.distinct.flatMap(k =>
      probePositions(k, bits).zipWithIndex.map { case (p, i) => (k, i, p) })
    val probe = probeRows.toDF("key", "gidx", "bitpos")
    // the positions are already driver-side — no job to recover them
    val positions = probeRows.map(_._3).distinct
    idx
      .where(col("bitpos").isin(positions: _*))
      .join(broadcast(probe), Seq("bitpos"))
      .groupBy("key", "file_id")
      .agg(countDistinct(col("gidx")).as("g"))
      .where(col("g") === GHashes)
      .select(col("file_id").cast("long"))
      .distinct().as[Long].collect().toSeq.sorted
  }

  /** q148: the SERVED bloom point lookup — all orders of the probe
    * customers, read through `file_id IN (candidates)` partition
    * pruning over the bloom-indexed layout. The exact `o_custkey IN`
    * predicate re-applies after the prune, so the answer is oracle-
    * equal to the plain filter regardless of the fp rate. */
  def pointLookup(spark: SparkSession, dir: String,
      keys: Seq[Long]): DataFrame = {
    // validate BEFORE the memoized layout build — a bad key list must
    // not pay (or cache) a multi-second build job on a cold JVM
    requireProbeKeys(keys)
    val (path, _) = layoutCached(spark, dir)
    lookupIn(spark, path, keys)
  }

  private def requireProbeKeys(keys: Seq[Long]): Unit =
    require(keys.nonEmpty && keys.size <= MaxProbeKeys,
      s"probe keys must be 1..$MaxProbeKeys")

  /** [[pointLookup]] against an explicit layout path (also the probe
    * stage over a post-deletion layout — see [[forgetKey]]). */
  def lookupIn(spark: SparkSession, layoutPath: String,
      keys: Seq[Long]): DataFrame = {
    requireProbeKeys(keys)
    val cands = candidateFiles(spark, s"$layoutPath.bloomidx", keys)
    val layout = spark.read.parquet(layoutPath)
    val pruned =
      if (cands.isEmpty) layout.where(lit(false))
      else layout.where(col("file_id").isin(cands: _*))
    pruned
      .where(col("o_custkey").isin(keys: _*))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  // ——— targeted deletion (right-to-erasure) through the index ———

  /** What [[deleteKeyFrom]] did: how much of the layout the deletion
    * actually touched. `filesRewritten` is fp-dependent (candidates),
    * `rowsDeleted` is exact. */
  case class DeleteReport(filesTotal: Long, filesRewritten: Long,
      rowsDeleted: Long)

  /** Delete every row of `key` from a bloom-indexed layout by
    * rewriting ONLY the candidate files the index names — the
    * right-to-erasure path a 100 TB warehouse needs: a forget request
    * must not rewrite the corpus, and without a skipping index it has
    * no way to know which of the millions of files hold the user. All
    * non-candidate files are carried over BYTE-IDENTICAL (copied
    * verbatim — at cluster scale these are object-store pointer moves,
    * not data movement; spec-asserted equal); candidate files are
    * re-written without the key's rows, and the index is patched
    * INCREMENTALLY (old rows for untouched files kept, rewritten
    * files' partials recomputed) — never a full rebuild. Bloom
    * correctness is preserved in the safe direction: a rewritten
    * file's filter is rebuilt from its remaining keys, an untouched
    * file's filter was already correct, and the deleted key can at
    * worst remain as a false positive in an untouched file it never
    * inhabited. Writes are copy-on-write into `outPath` (the source
    * layout is immutable — a crashed delete leaves no torn state). */
  def deleteKeyFrom(spark: SparkSession, layoutPath: String,
      outPath: String, key: Long, bits: Int = BloomBits): DeleteReport = {
    import java.io.File
    import java.nio.file.{Files, StandardCopyOption}
    val cands = candidateFiles(spark, s"$layoutPath.bloomidx",
      Seq(key), bits).toSet
    val root = new File(layoutPath)
    val partDirs = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("file_id="))
    val out = new File(outPath)
    if (out.exists()) graft.AtomicSwap.deleteRecursively(out)
    out.mkdirs()
    def fidOf(d: File): Long = d.getName.stripPrefix("file_id=").toLong
    // non-candidates: verbatim copy (pointer moves at cluster scale)
    partDirs.filterNot(d => cands(fidOf(d))).foreach { d =>
      val dst = new File(out, d.getName); dst.mkdirs()
      Option(d.listFiles()).toSeq.flatten.filter(_.isFile).foreach { f =>
        Files.copy(f.toPath, new File(dst, f.getName).toPath,
          StandardCopyOption.COPY_ATTRIBUTES)
      }
    }
    // candidates: rewrite without the key, count what fell out — read
    // each candidate file from disk ONCE (cache the small partition;
    // the counts and the rewrite reuse the cached rows)
    var deleted = 0L
    val candDirs = partDirs.filter(d => cands(fidOf(d)))
    candDirs.foreach { d =>
      val rows = spark.read.parquet(d.getAbsolutePath).cache()
      val kept = rows.where(col("o_custkey") =!= key)
      deleted += rows.count() - kept.count()
      kept.repartition(1).write.mode("overwrite")
        .parquet(new File(out, d.getName).getAbsolutePath)
      rows.unpersist()
    }
    // incremental index patch: keep untouched files' rows, recompute
    // only the rewritten files' partials
    val oldIdx = spark.read.parquet(s"$layoutPath.bloomidx")
    val untouched =
      if (cands.isEmpty) oldIdx
      else oldIdx.where(!col("file_id").cast("long").isin(cands.toSeq: _*))
    val rebuilt =
      if (candDirs.isEmpty) untouched
      else untouched.unionByName(
        bloomIndexOn(
          spark.read.parquet(out.getAbsolutePath)
            .where(col("file_id").cast("long").isin(cands.toSeq: _*)),
          "o_custkey", bits)
          .select(col("file_id").cast(oldIdx.schema("file_id").dataType)
            .as("file_id"), col("bitpos")))
    rebuilt.repartition(1).write.mode("overwrite")
      .parquet(s"$outPath.bloomidx")
    DeleteReport(partDirs.size.toLong, candDirs.size.toLong, deleted)
  }

  private val forgetMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Long, Long),
      (String, DeleteReport)]

  /** The post-deletion layout for (dir, key): built copy-on-write from
    * the cached layout on first request, fingerprint-memoized like
    * [[layoutCached]] — but bounded to ONE cached version per dir: a
    * forgotten layout is a TRANSITION artifact (a real deployment
    * promotes it over the source via AtomicSwap), so caching every key
    * a caller sweeps would pile full layout copies into tmpdir for the
    * JVM lifetime. A new (key, fingerprint) evicts every other cached
    * version for the dir and retires its directories to the deferred
    * reaper. Returns (layout path, report). */
  def forgottenLayoutCached(spark: SparkSession, dir: String,
      key: Long): (String, DeleteReport) = {
    val fp = IvfIndex.dataFingerprint(dir, table = "orders")
    val memoKey = (dir, key, fp)
    val v = forgetMemo.getOrElseUpdate(memoKey, {
      val (src, _) = layoutCached(spark, dir)
      val p = s"$src.forget$key"
      val report = deleteKeyFrom(spark, src, p, key)
      (p, report)
    })
    val stale = forgetMemo.keys
      .filter(k => k._1 == dir && k != memoKey)
      .flatMap(forgetMemo.remove).flatMap(x =>
        Seq(x._1, s"${x._1}.bloomidx")).toSeq
    graft.IndexGc.retire(s"bloomforget:$dir", stale)
    v
  }

  /** q151: the post-erasure lookup — delete customer `delKey`'s rows
    * through the index (candidate files only), then probe both the
    * deleted key and a surviving one through the PATCHED index. The
    * oracle is the plain filter with the key excluded: the deleted
    * rows' ABSENCE and the survivors' presence both ride the hash. */
  def forgetKey(spark: SparkSession, dir: String, delKey: Long,
      probeKeys: Seq[Long]): DataFrame = {
    // validate BEFORE the memoized delete build — a bad probe list
    // must not pay (and cache) the copy-on-write deletion
    val probes = (delKey +: probeKeys).distinct
    requireProbeKeys(probes)
    val (path, _) = forgottenLayoutCached(spark, dir, delKey)
    lookupIn(spark, path, probes)
  }
}
