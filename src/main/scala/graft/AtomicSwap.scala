package graft

import java.io.File

/** Crash-safe directory replacement for local-FS table sinks.
  *
  * The naive swap (delete target, rename tmp into place) has a window
  * where the table does not exist at all: a crash between the delete and
  * the rename loses every previously committed row, and an epoch replay
  * would silently "recover" from the current batch only. This helper
  * keeps a committed copy on disk at every instant:
  *
  *   1. `target` → `target.old`   (aside, atomic rename)
  *   2. `tmp`    → `target`       (publish, atomic rename)
  *   3. delete `target.old`       (garbage collection; failure is benign)
  *
  * Every rename's return value is checked and failure raises — a sink
  * must never report success for a swap that did not happen. [[recover]]
  * heals the two possible crash states on startup: tmp left behind
  * (discard — it was never published) and aside-but-not-published
  * (`target.old` exists, `target` missing → rename the aside back).
  *
  * On a real cluster the same protocol runs against HDFS/S3 via atomic
  * `FileSystem.rename` — or disappears entirely under a table format
  * (Delta/Iceberg) whose commit log is the swap. The protocol, not the
  * local `java.io.File`, is the design point.
  */
object AtomicSwap {

  /** Replace `target` with fully-written `tmp`, never leaving a moment
    * without a committed copy. Call [[recover]] before reading `target`
    * in the same job if a previous run may have crashed mid-swap. */
  def publish(tmp: String, target: String): Unit =
    publish(tmp, target, target + ".old")

  /** [[publish]] with an explicit aside path — used by partition-scoped
    * sinks that must keep swap artifacts OUT of the readable table root
    * (a dot-prefixed sibling is invisible to Spark's file listing, so a
    * crash can never surface `part.tmp`/`part.old` as bogus partition
    * values to a concurrent reader). */
  def publish(tmp: String, target: String, aside: String): Unit = {
    val tmpF = new File(tmp)
    require(tmpF.exists(), s"tmp dir $tmp does not exist — nothing to publish")
    val targetF = new File(target)
    val oldF = new File(aside)
    if (oldF.exists()) deleteRecursively(oldF)
    if (targetF.exists() && !targetF.renameTo(oldF))
      sys.error(s"atomic swap: failed to move $target aside to $oldF")
    if (!tmpF.renameTo(targetF)) {
      // roll the aside back so the table is still readable, then fail
      if (oldF.exists()) oldF.renameTo(targetF)
      sys.error(s"atomic swap: failed to publish $tmp as $target")
    }
    if (oldF.exists()) deleteRecursively(oldF)
  }

  /** Heal a crashed swap: discard an unpublished tmp, restore an aside
    * copy if the publish never happened. Idempotent; call on startup or
    * before the first read of `target`. */
  def recover(target: String): Unit =
    recover(target, Seq(target + ".tmp", target + ".compact.tmp"),
      target + ".old")

  /** [[recover]] with explicit artifact paths (see 3-arg [[publish]]). */
  def recover(target: String, tmps: Seq[String], aside: String): Unit = {
    val targetF = new File(target)
    val oldF = new File(aside)
    tmps.map(new File(_)).filter(_.exists()).foreach(deleteRecursively)
    if (!targetF.exists() && oldF.exists() && !oldF.renameTo(targetF))
      sys.error(s"atomic swap recovery: failed to restore $oldF as $target")
    if (targetF.exists() && oldF.exists()) deleteRecursively(oldF)
  }

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    if (!f.delete() && f.exists()) sys.error(s"failed to delete $f")
  }
}
