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

/** One event for the streaming funnel. */
case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
    event_type: String)

/** Buffered per-user funnel state: (event-time micros, step index) of
  * every funnel-relevant event seen so far. */
case class FunnelBuf(times: Seq[(Long, Int)])

/** Update-mode streaming funnel output. */
case class FunnelProgress(user_id: Long, steps_reached: Long)

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

  /** q105: strict-order funnel — how many users reach each step of an
    * event-type sequence, where step i+1 must occur STRICTLY AFTER the
    * user's earliest completion of step i (the standard minimal-time
    * funnel semantics; same-microsecond ties do not advance, a
    * deterministic rule the oracle replays).
    *
    * Scale shape: ONE shuffle. Every step time is a conditional MIN
    * window over the same user partitioning — Catalyst stacks the
    * chained windows into one Window operator behind a single exchange
    * — then a per-user dedup rides the same partitioning and the
    * 3-row rollup is a map-side count into a single-partition agg.
    * Timestamps compare as exact micros; counts are integers — nothing
    * for an engine to round. */
  def funnel(spark: SparkSession, dir: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    funnelOn(Tables.events(spark, dir), steps)

  /** [[funnel]] over an explicit (user_id, ts, event_type) relation. */
  def funnelOn(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val byUser = Window.partitionBy("user_id")
    val base = events.select(col("user_id"), col("ts"), col("event_type"))
    val withTimes = steps.zipWithIndex.foldLeft(base) {
      case (d, (step, i)) =>
        val cond =
          if (i == 0) col("event_type") === step
          else col("event_type") === step && col("ts") > col(s"t$i")
        d.withColumn(s"t${i + 1}", min(when(cond, col("ts"))).over(byUser))
    }
    val stepTimes = steps.indices.map(i =>
      max(col(s"t${i + 1}")).as(s"t${i + 1}"))
    val perUser = withTimes
      .groupBy("user_id")
      .agg(stepTimes.head, stepTimes.tail: _*)
    val stepCounts = steps.indices.map(i =>
      count(when(col(s"t${i + 1}").isNotNull, lit(1))).as(s"c${i + 1}"))
    val counts = perUser.agg(stepCounts.head, stepCounts.tail: _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1L).as("step"), lit(s).as("event_type"),
        col(s"c${i + 1}").as("n_users"))
    }: _*)).as("f"))
      .select(col("f.step"), col("f.event_type"), col("f.n_users"))
      .orderBy("step")
  }

  /** STREAMING funnel twin — per-user funnel progress maintained as
    * keyed state, emitted in update mode whenever a user's batch
    * contains funnel-relevant events. The minimal-time strict-order
    * funnel is ORDER-SENSITIVE and late data is retroactive in both
    * directions (an earlier view can lower t1, which can ADMIT an
    * already-seen click as t2), so a single-pass "furthest step"
    * counter is wrong under reordering; instead the state buffers the
    * user's funnel-relevant event times (a few longs per event, under
    * a loud cap — the per-user-per-funnel horizon every production
    * funnel bounds anyway) and re-folds the exact batch rule per
    * update. The spec pins the stream's final answer equal to
    * [[funnelOn]] over the union of batches, including the
    * retroactive-late-click case.
    *
    * State BOUND: with `evictHorizonMs` set, the stream watermarks
    * `ts` (by `watermarkDelay`) and arms an event-time timer per user
    * at `last funnel event + horizon`; when the global watermark
    * passes it, the user's final [[FunnelProgress]] is emitted once
    * more (idempotent for the last-wins keyed consumers Update mode
    * implies) and the buffer is EVICTED — state is then bounded by the
    * number of users active within one horizon, not the stream's
    * lifetime, and the `maxBuffered` cap becomes a per-horizon
    * sanity guard instead of a kill switch. Inside the horizon the
    * answers are unchanged (spec-pinned); events for a user arriving
    * after their eviction start a fresh funnel — the horizon IS the
    * funnel window, the same contract the batch oracle expresses by
    * bounding its input relation. Without `evictHorizonMs` the
    * original unbounded-lifetime semantics are kept (no watermark, no
    * late filtering, full retroactivity). */
  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[String],
      maxBuffered: Int = 100000,
      evictHorizonMs: Option[Long] = None,
      watermarkDelay: String = "0 seconds"): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    require(evictHorizonMs.forall(_ > 0L), "horizon must be positive")
    val stepIdx = steps.zipWithIndex.toMap
    // the exact batch fold: t1 = min step-0 time; t_{i+1} = min
    // step-i time STRICTLY after t_i
    def reach(all: Seq[(Long, Int)]): Long = {
      var reached = 0L
      var prev = Long.MinValue
      var i = 0
      var stalled = false
      while (i < steps.length && !stalled) {
        val cand = all.collect {
          case (t, s) if s == i && (i == 0 || t > prev) => t
        }
        if (cand.isEmpty) stalled = true
        else { prev = cand.min; reached = i + 1L }
        i += 1
      }
      reached
    }
    val src =
      if (evictHorizonMs.isDefined)
        events.withWatermark("ts", watermarkDelay)
      else events
    val timeout =
      if (evictHorizonMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(
        (user: Long, it: Iterator[FunnelEvent],
            state: GroupState[FunnelBuf]) => {
          if (state.hasTimedOut) {
            // horizon passed the user's last funnel event: finalize
            // (re-emit the standing answer) and evict the buffer
            val fin = reach(state.get.times)
            state.remove()
            Iterator.single(FunnelProgress(user, fin))
          } else {
            val fresh = it.flatMap { e =>
              stepIdx.get(e.event_type).map { i =>
                val micros = e.ts.getTime * 1000L +
                  (e.ts.getNanos % 1000000) / 1000L
                (micros, i)
              }
            }.toSeq
            if (fresh.isEmpty) Iterator.empty
            else {
              val all = (state.getOption.map(_.times).getOrElse(Seq.empty)
                ++ fresh).sorted
              require(all.size <= maxBuffered,
                s"user $user exceeds $maxBuffered buffered funnel events " +
                  "— bound the funnel horizon upstream")
              state.update(FunnelBuf(all))
              evictHorizonMs.foreach { hz =>
                // re-arm at last-event + horizon, clamped above the
                // current watermark (Spark rejects a timer at/below it)
                val lastMs = all.last._1 / 1000L
                state.setTimeoutTimestamp(
                  math.max(lastMs + hz, state.getCurrentWatermarkMs() + 1L))
              }
              Iterator.single(FunnelProgress(user, reach(all)))
            }
          }
        })
  }

  /** q106: cohort retention — users grouped by their FIRST-seen day,
    * crossed with every later day they were active:
    * (cohort_dt, day_offset, active_users). The warehouse retention
    * matrix, exactly integer.
    *
    * Scale shape: the first-seen relation is one per-user aggregation;
    * the activity join is user-keyed (AQE broadcasts it when small);
    * the final rollup is a two-level distinct-count on
    * (cohort, offset, user) keys. Day boundaries are UTC date_format
    * strings (the q01 convention), so both engines bucket identically. */
  def cohorts(spark: SparkSession, dir: String): DataFrame =
    cohortsOn(Tables.events(spark, dir))

  /** Conversion attribution: every purchase credited to the user's
    * LAST touch (click/view) at or before the purchase AND the user's
    * FIRST touch at or before it — the two standard attribution models
    * of behavior analytics. Both are point-in-time lookups, so they
    * compile to [[AsofJoin]]'s union-window shape (tag the two sides,
    * one running window per key), NOT a θ-join: last touch is a running
    * `last(ignoreNulls)`, first touch a running `min` — BOTH ride the
    * same single window, so the whole operator is ONE shuffle on
    * user_id and linear work.
    *
    * Determinism: at equal ts, touches sort before purchases (inclusive
    * as-of, the DuckDB `ASOF ... >=` convention) and same-ts touches
    * order by event_id, so "last" is the max-event_id touch and "first"
    * the struct-min on (ts, event_id). Timestamps surface as epoch
    * micros. A purchase with no touch at or before it gets nulls. */
  def attribution(spark: SparkSession, dir: String): DataFrame =
    attributionOn(Tables.events(spark, dir))

  /** [[attribution]] over an explicit
    * (user_id, event_id, ts, event_type) relation. */
  def attributionOn(events: DataFrame): DataFrame = {
    val touches = events.where(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"), col("event_id"),
        struct(col("ts"), col("event_id"), col("event_type")).as("__t"),
        lit(0).as("__side"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast(touches.schema("__t").dataType).as("__t"),
        lit(1).as("__side"))
    // ONE window computes both models: running min(__t) = first touch so
    // far, running last(__t) = latest touch so far. Touches sort before
    // purchases at equal ts (inclusive as-of, the AsofJoin convention);
    // same-ts touches order by event_id, so "last" is the max-event_id
    // touch — deterministic without a separate dedup pass.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("__side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    touches.unionByName(purchases)
      .withColumn("__first", min(col("__t")).over(w))
      .withColumn("__last", last(col("__t"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("__last.event_id").as("last_touch_event"),
        col("__last.event_type").as("last_touch_type"),
        col("__first.event_id").as("first_touch_event"),
        col("__first.event_type").as("first_touch_type"))
      .orderBy("user_id", "event_id")
  }

  /** q122: top item JOURNEYS — the most frequent length-`len` windows
    * of each user's consecutive `props.k` sequence (self-transitions
    * kept: a→a→b is a real journey, unlike the simple-graph view the
    * q104/q119/q121 family takes). The path-mining query behind "what
    * flows lead here" dashboards.
    *
    * Scale shape: ONE user-keyed window shuffle computes all `len−1`
    * leads (same window frame → one Window operator), then a count
    * aggregation on the path tuple (map-side combine) and a k-bounded
    * TakeOrdered — no per-user collect, no explode of sequences.
    * Deterministic: ties order by the path itself. */
  def topPaths(spark: SparkSession, dir: String, len: Int = 3,
      topN: Int = 50): DataFrame =
    topPathsOn(
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      len, topN)

  /** [[topPaths]] over an explicit (user_id, ts, event_id, k) event
    * relation. */
  def topPathsOn(ev0: DataFrame, len: Int = 3, topN: Int = 50): DataFrame = {
    require(len >= 2 && topN > 0)
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val ev = ev0.where(col("k").isNotNull)
    val steps = (2 to len).foldLeft(ev) { (d, i) =>
      d.withColumn(s"p$i", lead(col("k"), i - 1).over(byUser))
    }
    val pathCols = col("k").as("p1") +: (2 to len).map(i => col(s"p$i"))
    steps
      .select(pathCols: _*)
      .where((2 to len).map(i => col(s"p$i").isNotNull).reduce(_ && _))
      .groupBy((1 to len).map(i => col(s"p$i")): _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt") +: (1 to len).map(i => col(s"p$i")): _*)
      .limit(topN)
  }

  /** [[cohorts]] over an explicit (user_id, ts) relation. */
  def cohortsOn(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("dt"))
    val first = ev.groupBy("user_id").agg(min(col("dt")).as("cohort_dt"))
    ev.join(first, Seq("user_id"))
      .groupBy(col("cohort_dt"),
        datediff(to_date(col("dt")), to_date(col("cohort_dt")))
          .cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy("cohort_dt", "day_offset")
  }

  /** Basket cap for [[basketLift]]: users engaging more distinct items
    * than this are DROPPED (both engines, same rule) — the classic
    * market-basket skew bound, since one bot/power user contributes
    * |basket|² pairs. Scale-stable: a replica-amplified corpus repeats
    * users, it does not grow their baskets. */
  val MaxBasket: Int = 256

  /** q132: market-basket lift — item pairs ranked by co-engagement
    * lift over per-user baskets, the catalog-analytics twin of q127's
    * token collocations (association-rule mining's lift measure,
    * Agrawal et al.; no reference counterpart — north-star extension).
    *
    * Semantics: basket(u) = the set of distinct items u touched;
    * users with |basket| > `maxBasket` are dropped (skew bound, same
    * rule in the oracle); support n_ab = users whose basket contains
    * BOTH a and b (a < b); lift = P(ab)/(P(a)·P(b)) over the U kept
    * users. Log-free fixed point (the q127 discipline):
    * `lift_ppm = (n_ab·U·10⁶) div (n_a·n_b)` — exact integers in both
    * engines, 128-bit intermediates, no float on the ranking
    * boundary. Output: top-`topK` (item_a, item_b, n_ab, lift_ppm) by
    * (lift desc, a, b), pairs with n_ab ≥ `minCount`.
    *
    * Scale shape: ONE shuffle builds the distinct (user, item)
    * relation, one user-keyed agg builds sorted basket arrays (cap
    * applied BEFORE pair expansion), then pair generation is a
    * map-only in-array combination expansion — |basket|²-bounded by
    * the cap, never a self-join of the event log. Pair counts
    * hash-agg with map-side combine; item counts are a vocab-sized
    * relation (AQE-broadcastable); U is a 1-row broadcast; the top-K
    * is a bounded heap. */
  def basketLift(spark: SparkSession, dir: String, minCount: Long = 5L,
      topK: Int = 100, maxBasket: Int = MaxBasket): DataFrame =
    basketLiftOn(
      // spread the RAW scan so the JSON parse sits ABOVE the inserted
      // exchange and runs on every core (no-op on a multi-split scan)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      minCount, topK, maxBasket)

  /** [[basketLift]] over an explicit (user_id, k) engagement relation. */
  def basketLiftOn(ev0: DataFrame, minCount: Long = 5L, topK: Int = 100,
      maxBasket: Int = MaxBasket): DataFrame = {
    require(topK > 0, "basketLift needs a positive topK")
    val (_, nu, ic, pairs) = basketCore(ev0, minCount, maxBasket)
    pairs
      .join(ic.select(col("k").as("item_a"), col("n").as("na")),
        Seq("item_a"))
      .join(ic.select(col("k").as("item_b"), col("n").as("nb")),
        Seq("item_b"))
      .crossJoin(broadcast(nu))
      .withColumn("lift_ppm", expr(
        "CAST((CAST(n_ab AS DECIMAL(38,0)) * u * 1000000) div " +
          "(CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("lift_ppm"))
      .orderBy(desc("lift_ppm"), col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** The shared basket machinery of [[basketLiftOn]] /
    * [[basketRulesOn]]: capped per-user basket arrays (cached — read
    * by U, the item counts, and the pair expansion), the 1-row kept-
    * user count, vocab-sized item counts, and the min-count-filtered
    * unordered pair supports. */
  private def basketCore(ev0: DataFrame, minCount: Long, maxBasket: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(minCount >= 1L, "basket analytics need minCount >= 1")
    require(maxBasket >= 2, "basket analytics need maxBasket >= 2")
    val baskets = graft.Caches.register(
      ev0.where(col("k").isNotNull)
        .select(col("user_id"), col("k"))
        .distinct()
        .groupBy("user_id")
        .agg(sort_array(collect_set(col("k"))).as("items"))
        .where(size(col("items")) <= maxBasket)
        .cache())
    val nu = baskets.agg(count(lit(1)).as("u")) // 1 row — broadcast
    // cached: vocab-sized, and joined twice by both consumers (lift's
    // na/nb, rules' na/nc) — uncached each join re-runs the basket
    // explode + aggregation
    val ic = graft.Caches.register(baskets
      .select(explode(col("items")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .cache())
    // in-array combination expansion: map-only, |basket|²-bounded by
    // the cap — the event log never self-joins
    val pairs = baskets
      .select(explode(expr(
        "flatten(transform(items, (a, i) -> " +
          "transform(slice(items, i + 2, size(items)), " +
          "b -> named_struct('a', a, 'b', b))))")).as("p"))
      .select(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    (baskets, nu, ic, pairs)
  }

  /** q133: association RULES — the directional form of [[basketLift]]
    * (the support / confidence / lift triple of Agrawal et al.'s
    * market-basket framework): each supported pair emits both
    * `a ⇒ b` and `b ⇒ a` with
    * `conf_ppm = (n_ab·10⁶) div n_antecedent` (the estimated
    * P(consequent | antecedent)) and the shared symmetric lift.
    * Output: top-`topK` (antecedent, consequent, n_ab, conf_ppm,
    * lift_ppm) by (conf desc, antecedent, consequent).
    *
    * Scale shape: [[basketCore]] verbatim (one cached capped-basket
    * carrier, map-only pair expansion) + a 2× union of the SUPPORTED
    * pair relation — output-bounded, the corpus is not touched again;
    * the top-K is a bounded heap. */
  def basketRules(spark: SparkSession, dir: String, minCount: Long = 5L,
      topK: Int = 100, maxBasket: Int = MaxBasket): DataFrame =
    basketRulesOn(
      // spread the RAW scan: JSON parse above the exchange (see basketLift)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      minCount, topK, maxBasket)

  /** [[basketRules]] over an explicit (user_id, k) relation. */
  def basketRulesOn(ev0: DataFrame, minCount: Long = 5L, topK: Int = 100,
      maxBasket: Int = MaxBasket): DataFrame = {
    require(topK > 0, "basketRules needs a positive topK")
    val (_, nu, ic, pairs0) = basketCore(ev0, minCount, maxBasket)
    // cache the SUPPORTED pairs (minCount-filtered — output-bounded,
    // tiny): the two directed union branches below are separate plan
    // subtrees, so without this the basket pair expansion + groupBy
    // runs TWICE (measured: 2 × ~1.5 s stages at sf0.1)
    val pairs = graft.Caches.register(pairs0.cache())
    val directed = pairs
      .select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("n_ab"))
      .union(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_ab")))
    directed
      .join(ic.select(col("k").as("antecedent"), col("n").as("na")),
        Seq("antecedent"))
      .join(ic.select(col("k").as("consequent"), col("n").as("nc")),
        Seq("consequent"))
      .crossJoin(broadcast(nu))
      .withColumn("conf_ppm", expr(
        "CAST((CAST(n_ab AS DECIMAL(38,0)) * 1000000) div na AS BIGINT)"))
      .withColumn("lift_ppm", expr(
        "CAST((CAST(n_ab AS DECIMAL(38,0)) * u * 1000000) div " +
          "(CAST(na AS DECIMAL(38,0)) * nc) AS BIGINT)"))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("conf_ppm"), col("lift_ppm"))
      .orderBy(desc("conf_ppm"), col("antecedent"), col("consequent"))
      .limit(topK)
  }
}
