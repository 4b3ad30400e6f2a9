package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{BloomSkip, Layouts}

/** The STREAMING erasure twin (round-15 verdict #3): forget requests
  * arriving continuously — the compliance queue a real warehouse has —
  * folded into an accumulated key set and applied to the served bloom
  * layout as the SAME one-job batched copy-on-write rewrite the batch
  * path runs (`BloomSkip.forgottenLayoutCached`), once per epoch.
  *
  * Idempotence is by construction, not bookkeeping: the accumulated
  * key set is a SET union (replayed epochs re-deliver the same keys —
  * a no-op), and the post-erasure layout is a PURE FUNCTION of
  * (accumulated keys, corpus fingerprint) — exactly the memo key of
  * `forgottenLayoutCached`, so a replayed epoch converges onto the
  * identical version (the [[SketchStream]] twin discipline: the stream
  * and the batch share one verdict function, so restart/replay cannot
  * diverge them). Crash anywhere between the state publish and the
  * rewrite: the replay re-unions (no-op) and re-requests the same
  * version (memo hit or identical rebuild).
  *
  * State is ONE small sorted key file beside the checkpoint, published
  * atomically (tmp + rename) — bounded by the total number of
  * erasure requests ever, not by the corpus. Epochs with no new keys
  * skip the rewrite entirely.
  *
  * No reference counterpart (the reference has no delete path); the
  * public design this mirrors is a Delta/Iceberg table fed by a CDC
  * stream of DELETE rows. */
object ForgetStream {

  private def keysFile(stateDir: String) =
    new java.io.File(stateDir, "forget_keys.txt")

  /** The accumulated erasure set at `stateDir` (empty before the
    * first request). */
  def accumulatedKeys(stateDir: String): Seq[Long] = {
    val f = keysFile(stateDir)
    if (!f.exists()) Seq.empty
    else new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toLong)
  }

  private def publishKeys(stateDir: String, keys: Seq[Long]): Unit = {
    val dir = new java.io.File(stateDir)
    dir.mkdirs()
    val tmp = new java.io.File(dir, ".forget_keys.txt.tmp")
    java.nio.file.Files.write(tmp.toPath,
      keys.sorted.distinct.mkString("", "\n", "\n").getBytes("UTF-8"))
    val dst = keysFile(stateDir)
    if (!tmp.renameTo(dst)) {
      dst.delete()
      require(tmp.renameTo(dst), s"cannot publish $dst")
    }
  }

  /** foreachBatch sink: fold the micro-batch's `key` column into the
    * accumulated erasure set, then apply ONE batched rewrite of the
    * full set from the base layout (memoized — an epoch that adds no
    * new key costs a memo hit). The batch must carry a LongType
    * `key` column; NULL keys are dropped (an erasure request without
    * a key erases nothing — and the rewrite itself is NULL-safe
    * anyway). */
  def forgetSinkEachBatch(dir: String, stateDir: String)
      (batch: DataFrame, epochId: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val incoming = batch.where(col("key").isNotNull)
      .select(col("key").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val all = (accumulatedKeys(stateDir) ++ incoming).distinct.sorted
    if (all.isEmpty) return // nothing requested yet
    require(all.size <= BloomSkip.MaxForgetKeys,
      s"accumulated erasure set exceeds ${BloomSkip.MaxForgetKeys} — " +
        "promote the current version over the base (AtomicSwap) and " +
        "reset the queue state")
    // STATE FIRST, rewrite second: a crash in between replays to the
    // same set (union is idempotent) and the rewrite converges on the
    // same memo key — the sketch-first ordering argument of
    // [[DocStream.incrementalDedupSinkEachBatch]]
    publishKeys(stateDir, all)
    BloomSkip.forgottenLayoutCached(batch.sparkSession, dir, all)
    ()
  }

  /** The stream-maintained post-erasure lookup: probe through the
    * version the accumulated erasure set currently implies — the
    * serving read a compliance dashboard runs between epochs. Equals
    * the batch `BloomSkip.forgetKeys` of the same set (twin-pinned). */
  def lookup(spark: SparkSession, dir: String, stateDir: String,
      probeKeys: Seq[Long]): DataFrame = {
    val keys = accumulatedKeys(stateDir)
    if (keys.isEmpty) BloomSkip.pointLookup(spark, dir, probeKeys)
    else {
      val (path, _) = BloomSkip.forgottenLayoutCached(spark, dir, keys)
      BloomSkip.lookupIn(spark, path, probeKeys)
    }
  }

  /** The current accumulated version's lineage footprint — for specs
    * and ops: (accumulated key count, lineage version count). */
  def status(spark: SparkSession, dir: String,
      stateDir: String): (Int, Int) = {
    val (base, _) = BloomSkip.layoutCached(spark, dir)
    (accumulatedKeys(stateDir).size,
      Layouts.versions(BloomSkip.lineageLogOf(base)).size)
  }
}
