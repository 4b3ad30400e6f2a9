package graft.streaming

import org.apache.spark.sql.SparkSession

/** One JVM-wide ownership registry for ACCUMULATED sink directories —
  * the single-writer discipline [[DocStream]] established, factored out
  * so every accumulated sink (sketch warehouse, media signatures,
  * basket pairs, graph edges) and every OFFLINE maintenance pass
  * (erasure rebuilds, takedowns) shares the same loud rejection:
  *
  *  - a sink running inside an ACTIVE streaming query records
  *    `query:<id>` as the directory's owner;
  *  - ownership transfers freely when the recorded owner is no longer
  *    an active query (restart, replay simulation, sequential tests);
  *  - a SECOND live writer — including a direct maintenance call such
  *    as `SketchStream.rebuildUserSketches` racing a live sink (the
  *    round-16 advice: the rebuild's atomic swap would silently discard
  *    the sink's in-flight epoch) — fails with a clear message instead
  *    of corrupting the store.
  *
  * Cross-JVM single-ownership stays the caller's responsibility, as
  * for any checkpointed foreachBatch sink. */
private[streaming] object SingleWriter {

  private val dirOwners =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Current caller's owner tag: `query:<streaming-query-id>` on a
    * stream execution thread, `direct` for plain method calls. */
  private def callerTag: String =
    "id = ([0-9a-fA-F-]+)".r
      .findFirstMatchIn(Thread.currentThread().getName)
      .map(m => s"query:${m.group(1)}").getOrElse("direct")

  /** Record (or transfer) ownership of `dir`; throw when an ACTIVE
    * streaming query other than the caller owns it. `what` names the
    * operation for the error message. */
  def assertOwner(sess: SparkSession, dir: String, what: String): Unit = {
    val owner = callerTag
    val key = new java.io.File(dir).getCanonicalPath
    val prev = dirOwners.putIfAbsent(key, owner)
    if (prev != null && prev != owner) {
      val prevActive = prev.startsWith("query:") &&
        sess.streams.active.exists(q => s"query:${q.id}" == prev)
      require(!prevActive,
        s"$what: $dir is owned by active streaming query $prev; a " +
          "second concurrent writer would interleave the accumulated " +
          "store's read-modify-write (lost rows / discarded epochs). " +
          "Stop the owning query before running this writer.")
      dirOwners.put(key, owner)
    }
  }
}
