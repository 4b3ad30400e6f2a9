package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** One event for sessionization (streaming path). */
case class SessEvent(user_id: Long, ts: java.sql.Timestamp)

/** A closed session. */
case class Session(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

/** Open-session state carried between micro-batches. */
case class SessState(start: Long, last: Long, n: Long)

/** Sessionization — gap-based session assembly, the canonical custom-
  * state streaming operator (and a standard feature of behavior
  * pipelines the reference's DAU table approximates with day buckets).
  *
  * Batch form: pure window functions — a new session starts where the
  * gap to the previous event exceeds `gapMinutes`; session ids are the
  * running count of starts. SQL-expressible → oracle-checked (q40).
  *
  * Streaming form: `flatMapGroupsWithState` keyed by user with a
  * processing-time timeout — state holds the open session; events
  * extend it, a gap (or timeout) closes and emits it. This is the
  * engine's `mapGroupsWithState` surface (SURVEY §1.4: Redis-held state
  * → Spark-managed keyed state).
  */
object Sessionize {

  /** Batch sessionization over `events`: per user, sessions split on
    * > `gapMinutes` silence. Output: one row per session. */
  def sessions(spark: SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"),
          1L).otherwise(0L))
      .withColumn("session_no",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_no")
      .agg(
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_no")
  }

  /** Streaming sessionization: emits a Session when a later event closes
    * it (gap exceeded) or the EVENT-TIME timeout fires (watermark passes
    * session_end + gap). Event-time timeouts are deterministic under
    * replay and don't busy-trigger empty batches the way processing-time
    * timeouts do — with no new data and no expired timers, no batch runs.
    * Callers must put a watermark on `ts` (see `withSessionWatermark`). */
  def sessionsStream(events: Dataset[SessEvent],
      gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[SessEvent], state: GroupState[SessState]) => {
          if (state.hasTimedOut) {
            val s = state.get; state.remove()
            Iterator(Session(user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += Session(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n)
                  cur = Some(SessState(t, t, 1))
                case None =>
                  cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
        })
  }

  /** Watermarked input for [[sessionsStream]]. */
  def withSessionWatermark(events: Dataset[SessEvent],
      delay: String = "10 minutes"): Dataset[SessEvent] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay).as[SessEvent]
  }
}
