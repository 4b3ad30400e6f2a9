package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame

/** Registry for operator-internal cached carriers (the shingle index,
  * minhash signature arrays, simhash clusters — see Dedup). The caches
  * are load-bearing WITHIN one query execution (each carrier feeds 2–3
  * plan subtrees), but the operators return lazy DataFrames, so they
  * cannot unpersist before the caller materializes the result. In a
  * long-lived session (HttpServer, a 56-query Verify/Bench run) the
  * leaked blocks would otherwise pin memory until LRU eviction.
  *
  * Contract: operators `register` their cached frames; the HOST calls
  * [[releaseAll]] once it has materialized the results it needs.
  * Releasing is always safe — at worst a subsequent reference recomputes.
  */
object Caches {
  private val reg = new ConcurrentLinkedQueue[DataFrame]()

  /** Track a cached frame for later release; returns it for chaining. */
  def register(df: DataFrame): DataFrame = { reg.add(df); df }

  /** Unpersist (non-blocking) every registered frame and clear. */
  def releaseAll(): Unit = {
    var df = reg.poll()
    while (df != null) { df.unpersist(blocking = false); df = reg.poll() }
  }

  /** Release the storage behind a `localCheckpoint`'d frame. UNLIKE
    * [[releaseAll]]'s cached frames, a checkpointed frame has its
    * lineage CUT — once its blocks are dropped it cannot recompute, so
    * this is only safe when no caller will action the frame again (the
    * GraphRank/Dedup loop contract, and the memo-eviction contract:
    * an evicted memo entry's frame must not be held across eviction). */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
