package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.cosineNative
import graft.functions.TextFunctions._

/** Right-to-erasure for the DOCUMENT corpus and every artifact derived
  * from it — the compliance operation a training-data pipeline actually
  * receives: "take down document X" must propagate through
  *
  *   1. the CURATED CORPUS (the stored documents themselves),
  *   2. the PACKED SHARDS (the doc's token spans live inside multi-doc
  *      training sequences — survivors of its block must repack),
  *   3. the persisted CORPUS BLOOM (the incremental-dedup sketch whose
  *      fingerprints gate re-ingestion),
  *   4. the RETRIEVAL INDEXES (positional postings for phrase/BM25
  *      serving; the IVF inverted file for ANN serving),
  *
  * or the "deleted" document keeps answering searches and keeps
  * training models. This is the q151–q160 orders-warehouse erasure
  * family applied to the LLM-pipeline side of the house, on the SAME
  * machinery: every artifact here is a manifest-versioned
  * `file_id=`-partitioned layout ([[Layouts]]), so a takedown is the
  * same ONE-JOB copy-on-write rewrite per artifact — candidates named
  * by that artifact's own index (corpus/IVF: per-file Bloom; shards:
  * the pack block hash; postings: the deleted docs' term buckets),
  * untouched files SHARED between versions by manifest row. A K-doc
  * takedown costs O(candidate files) per artifact, never O(corpus).
  *
  * No reference counterpart (the reference has no delete path at all);
  * the Delta/Iceberg DELETE + the Lucene delete-and-merge are the
  * public designs this re-expresses relationally.
  *
  * Artifact parameters are FROZEN at bundle build (the corpus-build
  * train-then-freeze discipline): pack budget/blocks match q59, IVF
  * cells/iters match q38/q56, postings buckets match q131 — so the
  * takedown queries share those queries' oracle arithmetic.
  */
object DocForget {

  /** Pack parameters — q59's (`Packing.pack` defaults). */
  val PackBudget: Int = 2048
  val PackBlocks: Int = 8

  /** IVF parameters — q38/q56's (`IvfIndex.trainCached` at 8×2). */
  val IvfCells: Int = 8
  val IvfIters: Int = 2

  /** The v1 artifact family for a document corpus: four
    * manifest-versioned layouts plus the rolling corpus Bloom. */
  case class Bundle(root: String, corpus: String, pack: String,
      postings: String, ivf: String, cents: IvfIndex.Centroids)

  /** What a takedown did to each artifact (files counted in that
    * artifact's own grain: corpus/IVF files, pack blocks, postings
    * term buckets). */
  case class TakedownReport(corpus: Layouts.DeleteReport,
      pack: Layouts.DeleteReport, postings: Layouts.DeleteReport,
      ivf: Layouts.DeleteReport)

  /** The post-takedown version family. `bloom` is the REBUILT corpus
    * fingerprint sketch (see [[rebuildBloom]]). */
  case class Takedown(corpus: String, pack: String, postings: String,
      ivf: String, bloom: String, report: TakedownReport)

  // ——— bundle build (v1) ————————————————————————————————————————————

  private def fingerprintOf(dir: String): Long =
    IvfIndex.dataFingerprint(dir, "documents") * 31L +
      IvfIndex.dataFingerprint(dir, "embeddings")

  private val bundleMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Long), Layouts.Once[Bundle]]

  private val takedownMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Seq[Long], Long), Layouts.Once[Takedown]]

  private val gen = new java.util.concurrent.atomic.AtomicLong(0L)

  def clearMemos(): Unit = {
    bundleMemo.clear(); takedownMemo.clear(); expansionMemo.clear()
  }

  /** Write one layout + manifest + schema sidecar. `df` must carry a
    * `file_id` column. */
  private def writeLayout(df: DataFrame, outDir: String): Unit = {
    df.repartition(col("file_id"))
      .write.mode("overwrite").partitionBy("file_id").parquet(outDir)
    val spark = df.sparkSession
    Layouts.writeOwnManifest(spark, outDir)
    Layouts.writeSchemaSidecar(spark.read.parquet(outDir), outDir)
  }

  /** Build the full v1 artifact family under `root` — each artifact in
    * its production layout:
    *  - corpus: arrival-keyed doc layout + per-file Bloom on doc_id
    *    ([[BloomSkip.bloomWrite]] — the q148 machinery, key swapped);
    *  - pack: q59's packed manifest partitioned by BLOCK (the shard
    *    unit — a takedown repacks only the deleted docs' blocks);
    *  - postings: q131's positional postings partitioned by term
    *    bucket (file_id := bkt, same crc32 bucketing);
    *  - ivf: q56's inverted file partitioned by cell (file_id := cell,
    *    same frozen centroids) + a per-file Bloom on vec_id so the
    *    takedown can name candidate cells without an assignment
    *    recompute (exact — no float-tie risk);
    *  - `_bloom.bf`: the corpus fingerprint sketch (the
    *    [[graft.streaming.DocStream]] incremental-dedup convention). */
  /** A COMPLETE bundle root: all four artifact manifests plus the
    * corpus sketch exist — the completion proof [[buildBundle]] leaves
    * behind (the sketch is written last). */
  private def bundleValid(root: String): Boolean =
    Seq(s"$root/corpus", s"$root/pack", s"$root/postings", s"$root/ivf")
      .forall(p => new java.io.File(Layouts.manifestPath(p)).exists()) &&
      new java.io.File(s"$root/_bloom.bf").exists()

  private def bundleAt(root: String,
      cents: IvfIndex.Centroids): Bundle =
    Bundle(root, s"$root/corpus", s"$root/pack", s"$root/postings",
      s"$root/ivf", cents)

  private def buildBundle(spark: SparkSession, dir: String,
      root: String): Bundle = {
    val cents = IvfIndex.trainCached(spark, dir, IvfCells, IvfIters)
    // REUSE a complete root (round-16 advice): the build is
    // deterministic per fingerprint, and an existing root may be
    // another process's LIVE serving bundle — with its pid-suffixed
    // takedown versions inside — so inline-deleting it would destroy
    // served layouts mid-read, bypassing the deferred-reaper grace.
    if (bundleValid(root)) return bundleAt(root, cents)
    // Otherwise build into a pid-suffixed tmp root and publish by
    // atomic rename; a torn old root (crashed build) retires through
    // the deferred reaper, never inline.
    val stamp =
      s"p${ProcessHandle.current().pid()}-g${gen.incrementAndGet()}"
    val tmp = s"$root.build-$stamp"
    val tmpF = new java.io.File(tmp)
    if (tmpF.exists()) graft.AtomicSwap.deleteRecursively(tmpF)
    tmpF.mkdirs()
    val corpus = s"$tmp/corpus"
    BloomSkip.bloomWrite(graft.Tables.documents(spark, dir),
      keyCol = "doc_id", fileKeyCol = "doc_id", outDir = corpus)
    val pack = s"$tmp/pack"
    writeLayout(Packing.packRelation(spark, dir, PackBudget, PackBlocks)
      .withColumn("file_id", col("block")), pack)
    val postings = s"$tmp/postings"
    writeLayout(Ranking.postingsPlan(graft.Tables.documents(spark, dir),
      Ranking.PostingsBuckets).withColumnRenamed("bkt", "file_id"),
      postings)
    val ivf = s"$tmp/ivf"
    writeLayout(graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        IvfIndex.cellExpr(cents, col("embedding")).cast("long")
          .as("file_id")), ivf)
    BloomSkip.bloomIndexOn(spark.read.parquet(ivf), "vec_id")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$ivf.bloomidx")
    rebuildBloom(spark, Layouts.readFiles(spark, corpus), s"$tmp/_bloom.bf")
    // publish: a torn old root moves aside to the reaper; the rename is
    // atomic, so no reader ever sees a half-built root
    val rootF = new java.io.File(root)
    if (rootF.exists()) {
      val aside = s"$root.torn-$stamp"
      require(rootF.renameTo(new java.io.File(aside)),
        s"cannot move torn bundle root $root aside")
      graft.IndexGc.retire(s"docbundle:$dir", Seq(aside))
    }
    if (!tmpF.renameTo(rootF)) {
      // lost a cross-process publish race: if the winner's root is
      // complete, serve it and retire our duplicate build
      require(bundleValid(root),
        s"cannot publish bundle $tmp as $root and no valid root exists")
      graft.IndexGc.retire(s"docbundle:$dir", Seq(tmp))
      return bundleAt(root, cents)
    }
    // the manifests were written under the tmp root and record absolute
    // physical paths — re-point them at the published location (v1
    // manifests are exactly the layout's own file dirs, so a relist is
    // equivalent); the _bloom.bf completion proof is already in place
    Seq(s"$root/corpus", s"$root/pack", s"$root/postings", s"$root/ivf")
      .foreach(p => Layouts.writeOwnManifest(spark, p))
    bundleAt(root, cents)
  }

  /** The memoized v1 bundle for `dir` (fingerprint-keyed; the
    * [[BloomSkip.layoutCached]] discipline — a corpus rewrite evicts
    * and retires the whole superseded bundle root). */
  def bundleCached(spark: SparkSession, dir: String): Bundle = {
    val fp = fingerprintOf(dir)
    val key = (dir, fp)
    val v = bundleMemo.getOrElseUpdate(key, new Layouts.Once({
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val root = sys.props("java.io.tmpdir") +
        s"/graft-docbundle-$tag-f${java.lang.Long.toHexString(fp)}"
      buildBundle(spark, dir, root)
    })).value
    val stale = bundleMemo.keys
      .filter(k => k._1 == dir && k != key)
      .flatMap(bundleMemo.remove).flatMap(_.peek).map(_.root).toSeq
    graft.IndexGc.retire(s"docbundle:$dir", stale)
    v
  }

  /** Rebuild the corpus fingerprint Bloom from the SURVIVING corpus
    * and publish it atomically (tmp + rename). A stale superset sketch
    * is already SAFE for dedup correctness (the exact confirm join
    * decides; see `DocStream.incrementalDedupSinkEachBatch`) — but it
    * is not safe for COMPLIANCE: the taken-down documents' fingerprints
    * are derived data too, and leaving them in the sketch both retains
    * a trace and silently degrades the fp rate as takedowns accumulate.
    * The rebuild is one distributed aggregation over the survivors. */
  private def rebuildBloom(spark: SparkSession, corpus: DataFrame,
      outFile: String): Unit = {
    val bloom = corpus.select(fingerprint(col("text")).as("fp"))
      .stat.bloomFilter("fp", 1000000L, 0.01)
    val dst = new java.io.File(outFile)
    val tmp = new java.io.File(dst.getParentFile, s".${dst.getName}.tmp")
    val out = new java.io.FileOutputStream(tmp)
    try bloom.writeTo(out) finally out.close()
    if (!tmp.renameTo(dst)) {
      dst.delete()
      require(tmp.renameTo(dst), s"cannot publish $dst")
    }
  }

  // ——— the takedown (v2) ————————————————————————————————————————————

  /** Candidate term buckets of the deleted docs — read from the
    * CORPUS LAYOUT through its own Bloom index (pushed doc_id filter
    * over candidate files only), tokenized with the postings build's
    * tokenizer, bucketed with its crc32 rule: an exact superset of the
    * buckets holding the docs' postings, ≤ the bucket count, without
    * touching the source tables. */
  private def postingBucketsOf(spark: SparkSession, corpusPath: String,
      ids: Seq[Long]): Set[Long] = {
    val cands0 = BloomSkip.candidateFiles(spark, s"$corpusPath.bloomidx",
      ids).toSet
    val cands = Layouts.manifestEntriesFor(spark, corpusPath, cands0).keySet
    if (cands.isEmpty) return Set.empty
    Layouts.readFiles(spark, corpusPath, Some(cands))
      .where(col("doc_id").isin(ids: _*))
      .select(explode(tokens(col("text"))).as("t"))
      .select(pmod(crc32(col("t")),
        lit(Ranking.PostingsBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSet
  }

  /** Apply the takedown to every artifact of `bundle` — four
    * independent one-job copy-on-write rewrites (corpus, pack,
    * postings, ivf), each pruned by its own index, plus the corpus
    * Bloom rebuild. The PACK rewrite is the interesting one: deleting
    * a doc from a block shifts every later doc's `start_tok` in that
    * block, so the surviving candidate-block rows REPACK (per-block
    * prefix sums recomputed inside the same job — `rewriteWithout`'s
    * transform hook); the result is bitwise what a fresh
    * `Packing.pack` over the post-takedown corpus would emit, which is
    * exactly what the q162 oracle pins. Untouched blocks never
    * rewrite — their prefix sums contained no deleted doc. */
  private def applyTakedown(spark: SparkSession, bundle: Bundle,
      ids: Seq[Long], tag: String): Takedown = {
    // pid + generation: per-JVM counters collide across processes
    // (the q160 lesson) — a second JVM's takedown must not land in a
    // dead JVM's still-referenced directories
    val g = s"p${ProcessHandle.current().pid()}-g${gen.incrementAndGet()}"
    // corpus + ivf: the generic bloom-indexed erasure, keys swapped
    val corpus2 = s"${bundle.corpus}.takedown$tag-g$g"
    val rCorpus = BloomSkip.deleteKeysFrom(spark, bundle.corpus, corpus2,
      ids, keyCol = "doc_id")
    val ivf2 = s"${bundle.ivf}.takedown$tag-g$g"
    val rIvf = BloomSkip.deleteKeysFrom(spark, bundle.ivf, ivf2, ids,
      keyCol = "vec_id")
    // pack: candidate blocks from the pack hash, survivors repacked
    val isDel = coalesce(col("doc_id").isin(ids: _*), lit(false))
    val packTotal = Layouts.manifestFileCount(spark, bundle.pack)
    val packCands = Layouts.manifestEntriesFor(spark, bundle.pack, ids
      .map(id => java.lang.Math.floorMod(md5LongScala(s"pack:$id"),
        PackBlocks.toLong))
      .toSet).keySet
    val pack2 = s"${bundle.pack}.takedown$tag-g$g"
    val repack: DataFrame => DataFrame = kept => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("block").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      kept.select(col("doc_id"), col("block"), col("n_tokens"),
          col("file_id"))
        .withColumn("start_tok",
          sum("n_tokens").over(w) - col("n_tokens"))
        .withColumn("bin", col("block") * lit(Packing.BinStride) +
          expr(s"start_tok div $PackBudget"))
    }
    val (_, packDeleted) = Layouts.rewriteWithout(spark, bundle.pack,
      pack2, packCands, isDel, repack)
    val rPack = Layouts.DeleteReport(packTotal,
      packCands.size.toLong, packTotal - packCands.size,
      packDeleted)
    // postings: candidate buckets from the deleted docs' own terms
    val postTotal = Layouts.manifestFileCount(spark, bundle.postings)
    val postCands = Layouts.manifestEntriesFor(spark, bundle.postings,
      postingBucketsOf(spark, bundle.corpus, ids)).keySet
    val postings2 = s"${bundle.postings}.takedown$tag-g$g"
    val (_, postDeleted) = Layouts.rewriteWithout(spark, bundle.postings,
      postings2, postCands, isDel)
    val rPost = Layouts.DeleteReport(postTotal,
      postCands.size.toLong, postTotal - postCands.size,
      postDeleted)
    // corpus Bloom: rebuilt from the survivors (see rebuildBloom)
    val bloom2 = s"$corpus2.bloom.bf"
    rebuildBloom(spark, Layouts.readFiles(spark, corpus2), bloom2)
    Takedown(corpus2, pack2, postings2, ivf2, bloom2,
      TakedownReport(rCorpus, rPack, rPost, rIvf))
  }

  /** The memoized post-takedown version family for (dir, ids) — ONE
    * cached takedown per dir (the [[BloomSkip.forgottenLayoutCached]]
    * discipline: a takedown is a transition artifact; a new batch
    * evicts the old one's versions to the deferred reaper — only the
    * versions' OWN files, never the shared bundle files). The build is
    * serialized under [[Layouts.withBuildGate]]. */
  def takedownCached(spark: SparkSession, dir: String,
      ids: Seq[Long]): Takedown = {
    val ks = ids.distinct.sorted
    require(ks.nonEmpty && ks.size <= BloomSkip.MaxForgetKeys,
      s"takedown ids must be 1..${BloomSkip.MaxForgetKeys}")
    val fp = fingerprintOf(dir)
    val memoKey = (dir, ks, fp)
    takedownMemo.getOrElseUpdate(memoKey, new Layouts.Once(
      Layouts.withBuildGate {
        val bundle = bundleCached(spark, dir)
        val tag =
          if (ks.size == 1) ks.head.toString
          else "b" + java.lang.Long.toHexString(
            md5LongScala(ks.mkString(",")))
        val td = applyTakedown(spark, bundle, ks, tag)
        // every artifact's version commits to its served lineage, and
        // superseded takedowns expire by retain-set reference counting
        // — the BloomSkip.forgottenLayoutCached discipline, applied
        // symmetrically to the doc-bundle family; eviction + retention
        // run ONLY here, serialized under the build gate
        takedownMemo.keys.filter(k => k._1 == dir && k != memoKey)
          .foreach(takedownMemo.remove)
        Seq(bundle.corpus -> td.corpus, bundle.pack -> td.pack,
          bundle.postings -> td.postings, bundle.ivf -> td.ivf)
          .foreach { case (base, head) =>
            Layouts.commitVersionIfAbsent(
              BloomSkip.lineageLogOf(base), base)
            Layouts.commitVersion(BloomSkip.lineageLogOf(base), head)
            Layouts.vacuumRetain(spark, BloomSkip.lineageLogOf(base),
              retainPaths = Set(base, head), inlineDelete = false)
          }
        td
      })).value
  }

  /** Whether the takedown for (dir, ids) is already built — the
    * serving layer's memoized bypass check. */
  def isTakedownMemoized(spark: SparkSession, dir: String,
      ids: Seq[Long]): Boolean =
    takedownMemo.get((dir, ids.distinct.sorted, fingerprintOf(dir)))
      .exists(_.peek.isDefined)

  // ——— the served post-takedown reads (q161–q165) ———————————————————

  private def requireProbes(keys: Seq[Long]): Unit =
    require(keys.nonEmpty && keys.size <= BloomSkip.MaxProbeKeys,
      s"probe ids must be 1..${BloomSkip.MaxProbeKeys}")

  /** q161: the post-takedown CORPUS probe — the deleted ids and the
    * survivors both looked up through the patched per-file Bloom
    * (candidate-file path pruning); the oracle is the plain filter
    * with the batch excluded, so every absence and every presence
    * rides the hash. */
  def takedownScan(spark: SparkSession, dir: String, delIds: Seq[Long],
      probeIds: Seq[Long]): DataFrame = {
    val probes = (delIds ++ probeIds).distinct
    requireProbes(probes)
    val t = takedownCached(spark, dir, delIds)
    val cands0 = BloomSkip.candidateFiles(spark, s"${t.corpus}.bloomidx",
      probes).toSet
    val cands = Layouts.manifestEntriesFor(spark, t.corpus, cands0).keySet
    Layouts.readFiles(spark, t.corpus, Some(cands))
      .where(col("doc_id").isin(probes: _*))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** q162: the post-takedown PACKED-SHARD manifest — survivors of the
    * deleted docs' blocks repacked (start_tok/bin shifted), every
    * other block byte-identical and manifest-shared. The oracle packs
    * the corpus with the batch excluded: any stale offset, leftover
    * span, or lost survivor fails the hash. */
  def takedownPack(spark: SparkSession, dir: String,
      delIds: Seq[Long]): DataFrame = {
    val t = takedownCached(spark, dir, delIds)
    Layouts.readFiles(spark, t.pack, None)
      .select(col("doc_id"), col("block"), col("n_tokens"),
        col("start_tok"), col("bin"))
      .orderBy("doc_id")
  }

  /** q163: phrase search through the PATCHED postings layout — the
    * q131 read path (bucket-pruned through the manifest) over the
    * post-takedown version; a taken-down doc must stop matching, every
    * other match must survive. */
  def takedownPhrase(spark: SparkSession, dir: String, delIds: Seq[Long],
      phrase: Seq[String] = Seq("query", "big", "part")): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs a non-empty phrase")
    val t = takedownCached(spark, dir, delIds)
    val bkts = Layouts.manifestEntriesFor(spark, t.postings,
      Ranking.phraseBuckets(phrase).toSet).keySet
    val p = graft.Caches.register(
      Layouts.readFiles(spark, t.postings, Some(bkts))
        .where(col("term").isInCollection(phrase.distinct))
        .select(col("doc_id"), col("pos"), col("term"))
        .cache())
    Ranking.phraseMatches(p, phrase)
  }

  /** q164: ANN search through the PATCHED inverted file — q56's probe
    * path (frozen centroids, partition-pruned probe cells, exact
    * cosine re-rank) over the post-takedown version. Takedowns never
    * retrain the coarse quantizer (IVF deployments retrain rarely, and
    * retraining would reshuffle every cell), so the oracle is q56's
    * unrolled-Lloyd chain with the deleted ids excluded from scoring
    * only. */
  def takedownAnn(spark: SparkSession, dir: String, delIds: Seq[Long],
      queryId: Long = 0L, k: Int = 10, nprobe: Int = 3): DataFrame = {
    require(k > 0 && nprobe > 0, "k and nprobe must be positive")
    require(!delIds.contains(queryId),
      s"query vector $queryId is in the takedown batch")
    val t = takedownCached(spark, dir, delIds)
    val q = graft.Tables.embeddings(spark, dir)
      .where(col("vec_id") === queryId).select("embedding").collect()
    require(q.nonEmpty, s"unknown query vec_id $queryId")
    val qv = q(0).getSeq[Float](0).toArray
    // the frozen quantizer — memoized per (dir, cells, iters), the
    // same centroids the bundle's inverted file was assigned with
    val cents = IvfIndex.trainCached(spark, dir, IvfCells, IvfIters)
    val probes = Layouts.manifestEntriesFor(spark, t.ivf,
      IvfIndex.probeCells(cents, qv, nprobe).map(_.toLong).toSet).keySet
    Layouts.readFiles(spark, t.ivf, Some(probes))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        roundStable(cosineNative(col("embedding"), typedlit(qv)), 6)
          .as("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** q165: the takedown ACCOUNTING — exact deleted-row counts per
    * artifact from the rewrite jobs' own Observation metrics. The
    * oracle recomputes each count from the source tables (corpus/pack
    * rows = docs in the batch; postings rows = their total token
    * count; ivf rows = their vectors), so a takedown that deleted too
    * little (a leftover posting) or too much (a lost survivor row)
    * fails on exact integers. */
  def takedownReport(spark: SparkSession, dir: String,
      delIds: Seq[Long]): DataFrame = {
    val t = takedownCached(spark, dir, delIds)
    import spark.implicits._
    Seq(
      ("corpus", t.report.corpus.rowsDeleted),
      ("ivf", t.report.ivf.rowsDeleted),
      ("pack", t.report.pack.rowsDeleted),
      ("postings", t.report.postings.rowsDeleted))
      .toDF("artifact", "rows_deleted")
      .orderBy("artifact")
  }

  // ——— cluster-cascade takedown (q166/q167) —————————————————————————

  private val expansionMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Seq[Long], Long), Seq[(Long, Long)]]

  /** The (doc_id, comp) rows the seeds expand to — the shared core of
    * [[expandCluster]]/[[clusterExpansionCached]], memoized per
    * (dir, seeds, fingerprint): the component chain is a corpus-scale
    * job and a serving JVM must not re-run it per request. Driver
    * footprint: the seeds' component ids (≤ seeds) and the expanded
    * member list (cluster-sized, capped) — the component relation
    * itself stays distributed. NOTE: registers cached carriers; the
    * HOST releases them (the [[graft.Caches]] contract). */
  private def expansionRows(spark: SparkSession, dir: String,
      seedIds: Seq[Long]): Seq[(Long, Long)] = {
    val seeds = seedIds.distinct.sorted
    require(seeds.nonEmpty && seeds.size <= BloomSkip.MaxForgetKeys,
      s"takedown seeds must be 1..${BloomSkip.MaxForgetKeys}")
    expansionMemo.getOrElseUpdate((dir, seeds, fingerprintOf(dir)), {
      val out = clusterExpansion(spark, dir, seeds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      require(out.size <= BloomSkip.MaxForgetKeys,
        s"cluster cascade expanded to ${out.size} docs — beyond the " +
          s"${BloomSkip.MaxForgetKeys} batch cap; split the request")
      out
    })
  }

  /** Expand takedown seeds through their q60 near-dup clusters: the
    * REALISTIC takedown request — remove the infringing content, not
    * one copy of it. Cluster assignment is exactly [[Curation
    * .canonicalDocs]]'s (MinHash-LSH pairs → connected components,
    * singleton docs their own cluster), so the cascade is oracle-
    * replayable. */
  def expandCluster(spark: SparkSession, dir: String,
      seedIds: Seq[Long]): Seq[Long] = {
    val seeds = seedIds.distinct.sorted
    (seeds ++ expansionRows(spark, dir, seeds).map(_._1))
      .distinct.sorted
  }

  /** Whether the cascade for (dir, seeds) is already computed — the
    * serving layer's gate check. */
  def isExpansionMemoized(spark: SparkSession, dir: String,
      seedIds: Seq[Long]): Boolean =
    expansionMemo.contains(
      (dir, seedIds.distinct.sorted, fingerprintOf(dir)))

  /** q167: the cascade accounting — every (doc_id, cluster) the seeds
    * expand to, i.e. exactly what [[clusterTakedownScan]] will delete.
    * Deliberately RECOMPUTES the MinHash-LSH → components chain (the
    * q60 corpus-analytic cost class): an audit must re-prove the
    * cascade from the corpus. The serving route uses
    * [[clusterExpansionCached]] instead. */
  def clusterExpansion(spark: SparkSession, dir: String,
      seedIds: Seq[Long]): DataFrame = {
    val seeds = seedIds.distinct.sorted
    import spark.implicits._
    val comps = Dedup.connectedComponents(
      Dedup.minhashLshPairs(spark, dir, ordered = false))
    val all = graft.Tables.documents(spark, dir).select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
    val seedComps = all.where(col("doc_id").isin(seeds: _*))
      .select("comp").distinct().as[Long].collect()
    all.where(col("comp").isin(seedComps.toIndexedSeq: _*))
      .select(col("doc_id"), col("comp"))
      .orderBy("doc_id")
  }

  /** [[clusterExpansion]] served from the memo — what `/docTakedown
    * ?view=expansion` answers with (spec-pinned row-equal to the
    * recompute). */
  def clusterExpansionCached(spark: SparkSession, dir: String,
      seedIds: Seq[Long]): DataFrame = {
    import spark.implicits._
    expansionRows(spark, dir, seedIds)
      .toDF("doc_id", "comp").orderBy("doc_id")
  }

  /** q166: CLUSTER takedown — expand the seeds through their near-dup
    * clusters, then run the full q161 four-artifact takedown of the
    * expanded batch; the probe answers through the patched corpus.
    * The oracle excludes the cascade by re-deriving it (a NOT IN over
    * the replayed component chain), so both the deletion AND the
    * cascade's exact reach ride the hash. */
  def clusterTakedownScan(spark: SparkSession, dir: String,
      seedIds: Seq[Long], probeIds: Seq[Long]): DataFrame = {
    val expanded = expandCluster(spark, dir, seedIds)
    takedownScan(spark, dir, expanded,
      probeIds.filterNot(expanded.contains))
  }

  // ——— GDPR completion: private lineage + vacuum (the q160 shape) ———

  /** The retained post-vacuum version family of a PRIVATE lineage. */
  case class VacuumedTakedown(root: String, corpus: String, pack: String,
      postings: String, ivf: String,
      reports: Seq[(String, Layouts.VacuumReport)])

  /** Build a PRIVATE bundle lineage, apply the takedown, commit both
    * versions of every artifact to its version log, then VACUUM each
    * lineage to keepLast=1 — after this the deleted documents' bytes
    * are PHYSICALLY gone from every artifact (the spec sweeps every
    * parquet file under the root). Private per call (pid+gen path, the
    * q160 discipline): vacuum's inline delete requires exclusive
    * access, and the shared serving bundle must never lose a file
    * under a concurrent reader. */
  def vacuumTakedown(spark: SparkSession, dir: String,
      ids: Seq[Long]): VacuumedTakedown = Layouts.withBuildGate {
    val ks = ids.distinct.sorted
    require(ks.nonEmpty && ks.size <= BloomSkip.MaxForgetKeys,
      s"takedown ids must be 1..${BloomSkip.MaxForgetKeys}")
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = sys.props("java.io.tmpdir") +
      s"/graft-docvac-$tag-p${ProcessHandle.current().pid()}" +
      s"-g${gen.incrementAndGet()}"
    val bundle = buildBundle(spark, dir, root)
    val arts = Seq("corpus" -> bundle.corpus, "pack" -> bundle.pack,
      "postings" -> bundle.postings, "ivf" -> bundle.ivf)
    arts.foreach { case (name, p) =>
      Layouts.commitVersion(s"$root/log-$name", p)
    }
    val td = applyTakedown(spark, bundle, ks, "vac")
    val v2 = Map("corpus" -> td.corpus, "pack" -> td.pack,
      "postings" -> td.postings, "ivf" -> td.ivf)
    // the v1 corpus Bloom is derived data holding the deleted docs'
    // fingerprints — replace it with the rebuilt one before the sweep
    java.nio.file.Files.move(
      new java.io.File(td.bloom).toPath,
      new java.io.File(s"$root/_bloom.bf").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val reports = arts.map { case (name, _) =>
      Layouts.commitVersion(s"$root/log-$name", v2(name))
      name -> Layouts.vacuum(spark, s"$root/log-$name", keepLast = 1)
    }
    VacuumedTakedown(root, td.corpus, td.pack, td.postings, td.ivf,
      reports)
  }
}
