package graft.streaming

import java.io.File
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.AtomicSwap

/** Partition-scoped last-wins upsert for foreachBatch sinks.
  *
  * The round-2 verdict's one true streaming scale-killer was the
  * whole-table rewrite per micro-batch: O(table) work every 5-second
  * epoch. This helper rewrites ONLY the `<partCol>=<value>` directories
  * actually present in the batch — for a dt-partitioned DAU table that is
  * one day's slice; for a hash-bucketed dim store it is `touched/B` of
  * the table — while untouched partitions are not even read (the
  * byte-identical guarantee is pinned by a test).
  *
  * Each partition keeps the [[AtomicSwap]] crash-safety contract
  * individually: a committed copy of every partition exists on disk at
  * every instant, and a crash mid-loop is healed by replaying the epoch
  * (the upsert is idempotent per key). Swap artifacts are DOT-PREFIXED
  * siblings (`.part.tmp` / `.part.old`) — invisible to Spark's file
  * listing, so neither an in-flight swap nor a crash can ever surface a
  * bogus partition value to a concurrent reader. (A reader racing the
  * two renames of a swap can briefly see that one partition absent —
  * the same window the whole-table AtomicSwap has; `recoverAll` at the
  * next sink start restores it if the writer died in between.)
  *
  * At cluster scale this is exactly a MERGE INTO with dynamic partition
  * pruning under Delta/Iceberg; the directory protocol is the no-table-
  * format substitute, same as AtomicSwap itself.
  */
object PartitionedUpsert {

  /** Upsert `incoming` (which must carry `partCol`) into
    * `outDir/<partCol>=<v>` directories, last-wins on `mergeKeys` within
    * each partition. `partCol` is dropped from the stored files and
    * restored by partition discovery on read.
    *
    * CONTRACT: `incoming` must be unique per `mergeKeys` WITHIN the
    * batch (micro-batches arrive keyed — DauStream dedups upstream,
    * CdcRouter collapses to the last CDC op per id); the last-wins
    * merge is stored-vs-incoming, it does not order rows inside one
    * batch. */
  def upsert(incoming: DataFrame, outDir: String, partCol: String,
      mergeKeys: Seq[String]): Unit = {
    val spark = incoming.sparkSession
    new File(outDir).mkdirs()
    recoverAll(outDir)
    incoming.persist()
    try {
      val parts = incoming.select(partCol).distinct().collect().map(_.get(0))
      parts.foreach { v =>
        // null partition value (e.g. dt derived from a null timestamp):
        // use Spark's own default-partition dir name so partition
        // discovery reads the value BACK as SQL NULL — a literal
        // `dt=null` dir would resurface as the string "null"
        val part = s"$partCol=" +
          Option(v).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__")
        val dir = s"$outDir/$part"
        // null-safe comparison so the null slice is non-empty
        val slice = incoming.where(col(partCol) <=> lit(v)).drop(partCol)
        val cur = new File(dir)
        val merged =
          if (mergeKeys.isEmpty)
            // partition-key-only upsert: the partition IS the key — the
            // incoming slice replaces the stored partition wholesale
            // (also keeps an empty-reduce from killing the stream)
            slice
          else if (cur.exists() && Option(cur.list()).exists(_.nonEmpty)) {
            // null-safe anti-join per merge key: a plain equality join
            // never matches null keys, so a stored null-key row would
            // survive every epoch and each replay would append another
            // copy — silently breaking last-wins idempotence for exactly
            // the malformed rows (e.g. CDC payloads missing the id field)
            // most likely to be replayed
            val existing = spark.read.parquet(dir)
            val incKeys = slice.select(mergeKeys.map(col): _*)
            val sameKey = mergeKeys.map(k => existing(k) <=> incKeys(k))
              .reduce(_ && _)
            existing.join(incKeys, sameKey, "left_anti")
              .unionByName(slice, allowMissingColumns = true)
          } else slice
        merged.write.mode("overwrite").parquet(s"$outDir/.$part.tmp")
        AtomicSwap.publish(s"$outDir/.$part.tmp", dir, s"$outDir/.$part.old")
      }
    } finally incoming.unpersist()
  }

  /** Heal every crashed per-partition swap under `outDir` (orphaned
    * hidden `.part.tmp` discarded, unpublished `.part.old` restored). */
  def recoverAll(outDir: String): Unit =
    Option(new File(outDir).list()).foreach { names =>
      names.collect {
        case n if n.startsWith(".") && n.endsWith(".tmp") =>
          n.stripPrefix(".").stripSuffix(".tmp")
        case n if n.startsWith(".") && n.endsWith(".old") =>
          n.stripPrefix(".").stripSuffix(".old")
      }.distinct.foreach { part =>
        AtomicSwap.recover(s"$outDir/$part",
          Seq(s"$outDir/.$part.tmp"), s"$outDir/.$part.old")
      }
    }
}
