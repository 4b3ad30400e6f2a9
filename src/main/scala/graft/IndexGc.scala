package graft

import scala.collection.concurrent.TrieMap

/** Deferred reaper for superseded on-disk index directories
  * ([[graft.operators.Ranking]] postings, [[graft.operators.IvfIndex]]
  * inverted files).
  *
  * The fingerprint-keyed memos write each index generation into its OWN
  * directory (reader safety: a refresh never overwrites files a
  * concurrent scan may be listing) and evict superseded memo KEYS — but
  * until round 13 the superseded directories themselves stayed on disk
  * for the JVM's tmp lifetime, an unbounded leak for a refresh-heavy
  * serving process.
  *
  * The reaper closes the leak without racing readers via a one-refresh
  * grace generation: when a refresh evicts keys, the directories
  * condemned by the PREVIOUS refresh are deleted (a full refresh cycle
  * has passed since any caller could have obtained their paths) and the
  * newly evicted directories take their place in the condemned set. A
  * reader holds a path for at most the duration of one query; a path
  * only dies one whole refresh after it stopped being handed out, so no
  * in-flight scan can lose its files. The final generation (nothing
  * refreshes after it) is at most one directory per scope — bounded,
  * reclaimed by tmp cleanup, by design.
  */
object IndexGc {

  /** scope → directories condemned by that scope's latest refresh. */
  private val condemned = TrieMap.empty[String, List[String]]

  /** A refresh of `scope` evicted `stale` index directories: reap the
    * previously condemned generation and condemn `stale` for the next.
    * A memo HIT (no eviction) must pass `stale` empty and is a no-op —
    * otherwise a hit arriving right after a refresh would reap the
    * fresh-condemned generation a reader may still hold. */
  def retire(scope: String, stale: Seq[String]): Unit =
    if (stale.nonEmpty) synchronized {
      condemned.getOrElse(scope, Nil)
        .foreach(p => AtomicSwap.deleteRecursively(new java.io.File(p)))
      condemned(scope) = stale.toList
    }

  /** Test hook: forget condemned state WITHOUT deleting (the paired
    * index memos are cleared separately; their directories belong to
    * whoever still holds the paths). */
  def reset(): Unit = synchronized { condemned.clear() }
}
