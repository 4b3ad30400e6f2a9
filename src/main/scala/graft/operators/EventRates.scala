package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** One FINALIZED hourly bucket for the streaming anomaly twin (what an
  * append-mode watermarked `window(ts, '1 hour')` count emits). */
case class RateBucket(event_type: String, hour: java.sql.Timestamp,
    cnt: Long)

/** A streamed anomaly verdict (None = thin history, the batch rule). */
case class RateVerdict(event_type: String, hour_us: Long, cnt: Long,
    n_window: Long, is_anomaly: Option[Int])

/** Trailing per-type bucket history carried between micro-batches. */
case class RateState(buckets: Seq[(Long, Long)])

/** Time-windowed event statistics — the standard streaming-analytics
  * aggregation shape (tumbling event-time windows). The batch form below
  * is oracle-checked; the same expression bound to a stream with
  * `withWatermark` is the streaming form (see `windowedCountsStream`).
  */
object EventRates {

  /** Microseconds per calendar hour. */
  val HourUs: Long = 3600L * 1000000L

  /** Default horizon for the streaming gap guard: a per-type jump of
    * more than 2 years of calendar hours is a corrupt timestamp, not a
    * quiet service — drop it with a metric instead of letting one bad
    * row zero-fill unboundedly and poison the per-key high-watermark. */
  val DefaultMaxGapHours: Int = 2 * 8760

  /** Tumbling 1-hour windows × event_type: count + value rollup. */
  def hourlyStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        graft.functions.TextFunctions.moneySum(
          col("value")).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("cnt"), col("total_value"))
      .orderBy("wstart", "event_type")

  /** Streaming twin: watermarked tumbling windows (append-mode capable). */
  def windowedCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Trailing-window rate-anomaly flags — the ops-monitoring query every
    * event warehouse runs (is this hour's volume a spike/collapse vs the
    * recent past?), in a form BOTH engines replay bit-for-bit: the
    * classic z-score test |x − μ| > k·σ is algebraically cleared of
    * divisions and square roots,
    *   (n·x − S)² > k²·(n·Q − S²),
    * with S = Σcnt, Q = Σcnt² over the `windowHours` PRIOR observed
    * buckets — every operand an exact Long, so no float mean/stddev ever
    * materializes (a double σ would put an ulp on the decision
    * boundary). Hours with fewer than `minWindow` prior buckets get a
    * null verdict instead of a confident flag on thin history.
    *
    * The trailing frame is over OBSERVED buckets (rows), not calendar
    * hours — a type that vanishes for a day compares against its last
    * `windowHours` active hours (documented contract; a dense hour grid
    * would need a generated time dimension). Overflow bound: the test
    * multiplies three counts — safe while per-bucket counts stay below
    * ~2×10⁶ per key at k=3 (cube-root of Long range / window), far above
    * any hourly per-type volume this schema ships.
    *
    * Scale shape: one (type, hour) aggregation, then ONE key-partitioned
    * window over the (types × hours) bucket relation — corpus-sized
    * input collapses to bucket-sized before any window sorts. */
  def rateAnomalies(spark: SparkSession, dir: String,
      windowHours: Int = 24, minWindow: Int = 12, k: Int = 3): DataFrame =
    rateAnomaliesOn(Tables.events(spark, dir), windowHours, minWindow, k)

  /** [[rateAnomalies]] over an explicit (ts, event_type) relation. */
  def rateAnomaliesOn(events: DataFrame,
      windowHours: Int = 24, minWindow: Int = 12, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowHours >= minWindow && minWindow >= 2 && k >= 1)
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(-windowHours, -1)
    hourly
      .withColumn("s", sum("cnt").over(w))
      .withColumn("q", sum(expr("cnt * cnt")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
        col("cnt"), col("n").as("n_window"),
        when(col("n") < minWindow, lit(null).cast("int"))
          .otherwise(
            (expr("(n * cnt - s) * (n * cnt - s)") >
              expr(s"${k.toLong * k} * (n * q - s * s)")).cast("int"))
          .as("is_anomaly"))
      .orderBy("event_type", "hour_s")
  }

  /** q123: [[rateAnomalies]] over a DENSE CALENDAR-HOUR grid — the
    * production-correct twin of the observed-bucket form for corpora
    * with gaps (round-10 verdict #3): a type that goes quiet no longer
    * compares its next burst against a stale last-active window, and
    * its silent hours surface as explicit cnt = 0 rows the z-test can
    * FLAG (collapse detection — an ops monitor's first requirement,
    * which the observed-bucket frame structurally cannot express).
    *
    * Grid contract: per event type, every calendar hour from that
    * type's FIRST observed hour (it cannot be judged before it exists)
    * through the GLOBAL last observed hour (so a vanished type keeps
    * producing zero rows while the corpus is still live); missing
    * hours count 0. The trailing frame is then truly `windowHours`
    * CALENDAR hours, and `n_window` = hours since the type appeared,
    * capped at `windowHours`.
    *
    * Scale shape: the corpus collapses to (type, hour) buckets FIRST
    * (the q120 aggregation); the grid is types × hours — `sequence`
    * + explode over a per-type (hmin, global hmax) relation that is
    * type-count-sized with a broadcast 1-row global max, so nothing
    * corpus-sized ever joins the grid. One keyed left join densifies,
    * one per-type window scores. Same integer-cleared z-test, same
    * overflow bound as [[rateAnomaliesOn]]. */
  def rateAnomaliesDense(spark: SparkSession, dir: String,
      windowHours: Int = 24, minWindow: Int = 12, k: Int = 3): DataFrame =
    rateAnomaliesDenseOn(Tables.events(spark, dir), windowHours,
      minWindow, k)

  /** [[rateAnomaliesDense]] over an explicit (ts, event_type) relation. */
  def rateAnomaliesDenseOn(events: DataFrame,
      windowHours: Int = 24, minWindow: Int = 12, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowHours >= minWindow && minWindow >= 2 && k >= 1)
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val span = hourly.groupBy("event_type").agg(min("h").as("hmin"))
    val gmax = hourly.agg(max("h").as("hmax")) // 1 row, broadcast
    val grid = span.crossJoin(broadcast(gmax))
      .select(col("event_type"),
        explode(sequence(col("hmin"), col("hmax"),
          expr("interval 1 hour"))).as("h"))
    val dense = grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(-windowHours, -1)
    dense
      .withColumn("s", sum("cnt").over(w))
      .withColumn("q", sum(expr("cnt * cnt")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
        col("cnt"), col("n").as("n_window"),
        when(col("n") < minWindow, lit(null).cast("int"))
          .otherwise(
            (expr("(n * cnt - s) * (n * cnt - s)") >
              expr(s"${k.toLong * k} * (n * q - s * s)")).cast("int"))
          .as("is_anomaly"))
      .orderBy("event_type", "hour_s")
  }

  /** STREAMING twin of [[rateAnomalies]]: verdicts over a stream of
    * FINALIZED hourly buckets — compose `windowedCountsStream` (the
    * watermarked append-mode hourly count, which emits a (type, hour)
    * bucket exactly once, when the watermark closes it) into this
    * keyed-state stage. Per event type the state carries the last
    * `windowHours` buckets; each arriving bucket gets the SAME integer
    * verdict as the batch operator — (n·x−S)² > k²·(n·Q−S²) over the
    * trailing buckets, null under `minWindow` — then joins the trailing
    * history itself.
    *
    * Input contract: per-type buckets arrive in hour order across
    * batches (append-mode watermark aggregation emits exactly that —
    * the scd2Stream delivery-contract argument); within a batch any
    * order is fine, the fold sorts. Enforced like scd2Stream: a bucket
    * at or below the newest bucket hour already folded is DROPPED and
    * counted on `lateDrops` instead of silently polluting the trailing
    * window out of order. A bucket jumping MORE than `maxGapHours`
    * calendar hours past the newest folded bucket is also dropped
    * (counted on `gapDrops`): a corrupt far-future timestamp would
    * otherwise permanently advance the per-key high-watermark and
    * silently lateness-drop every genuine bucket after it — the
    * MaxLcsPairs loud-guard discipline applied to time.
    *
    * Both drop accumulators are AT-LEAST-ONCE metrics (updated inside
    * a transformation — task retries / speculation can re-apply them);
    * they monitor contract violations and never affect the emitted
    * rows, which are exact (state-store commit is per-epoch
    * transactional). */
  def rateAnomalyStream(buckets: Dataset[RateBucket],
      windowHours: Int = 24, minWindow: Int = 12, k: Int = 3,
      lateDrops: Option[org.apache.spark.util.LongAccumulator] = None,
      maxGapHours: Int = DefaultMaxGapHours,
      gapDrops: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[RateVerdict] = {
    import buckets.sparkSession.implicits._
    require(windowHours >= minWindow && minWindow >= 2 && k >= 1)
    require(maxGapHours >= 1, "maxGapHours must be >= 1")
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + (t.getNanos / 1000L)
    buckets.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (tpe: String, it: Iterator[RateBucket],
            state: GroupState[RateState]) => {
          var hist = state.getOption.map(_.buckets).getOrElse(Seq.empty)
          val out = Seq.newBuilder[RateVerdict]
          it.toSeq.sortBy(b => micros(b.hour)).foreach { b =>
            // late check folds as buckets do (not a pre-pass), so a
            // within-batch duplicate hour is caught too
            if (hist.nonEmpty && micros(b.hour) <= hist.last._1)
              lateDrops.foreach(_.add(1L))
            else if (hist.nonEmpty &&
                micros(b.hour) - hist.last._1 > maxGapHours * HourUs)
              gapDrops.foreach(_.add(1L))
            else {
              val n = hist.size.toLong
              val verdict =
                if (n < minWindow) None
                else {
                  val s = hist.map(_._2).sum
                  val q = hist.map(h => h._2 * h._2).sum
                  val lhs = n * b.cnt - s
                  Some(if (lhs * lhs > k.toLong * k * (n * q - s * s)) 1
                    else 0)
                }
              out += RateVerdict(tpe, micros(b.hour), b.cnt, n, verdict)
              hist = (hist :+ (micros(b.hour), b.cnt)).takeRight(windowHours)
            }
          }
          state.update(RateState(hist))
          out.result().iterator
        })
  }

  /** STREAMING twin of [[rateAnomaliesDense]]: before folding an
    * arriving bucket, every missing calendar hour since the type's
    * last folded bucket is folded as an explicit cnt = 0 bucket —
    * emitting its verdict row exactly like the batch grid. Late and
    * duplicate-hour buckets drop with metric ([[rateAnomalyStream]]'s
    * rule), and a bucket jumping more than `maxGapHours` past the last
    * folded hour drops on `gapDrops` instead of zero-filling
    * unboundedly (one corrupt far-future timestamp would otherwise
    * emit millions of rows in a single trigger AND poison the per-key
    * high-watermark so every genuine bucket after it is "late").
    *
    * Parity domain: per type, the stream matches the batch grid for
    * every hour up to that type's newest ARRIVED bucket — and, with
    * `trailingSilence = true`, beyond it: an event-time timer
    * ([[GroupStateTimeout.EventTimeTimeout]]) re-arms one hour past
    * each type's newest folded bucket, and when the GLOBAL watermark
    * (driven by the OTHER types' arrivals) passes it, the silent
    * type's missing hours fold as zeros up to the watermark — the
    * live "type X went dark" collapse alert the batch grid expresses
    * as trailing zero rows. Timer folds are capped at `maxGapHours`
    * per firing (same guard, `gapDrops`-counted if truncated).
    *
    * `trailingSilence` requires an event-time watermark on `hour`
    * (Spark rejects EventTimeTimeout without one) — this function
    * applies `withWatermark("hour", watermarkDelay)` itself. Note the
    * watermark also LATENESS-FILTERS input rows before the fold, so
    * `lateDrops` then only sees disorder within the watermark's slack.
    *
    * Drop accumulators are at-least-once metrics ([[rateAnomalyStream]]
    * 's caveat); emitted rows are exact. */
  def rateAnomalyStreamDense(buckets: Dataset[RateBucket],
      windowHours: Int = 24, minWindow: Int = 12, k: Int = 3,
      lateDrops: Option[org.apache.spark.util.LongAccumulator] = None,
      maxGapHours: Int = DefaultMaxGapHours,
      gapDrops: Option[org.apache.spark.util.LongAccumulator] = None,
      trailingSilence: Boolean = false,
      watermarkDelay: String = "0 seconds"): Dataset[RateVerdict] = {
    import buckets.sparkSession.implicits._
    require(windowHours >= minWindow && minWindow >= 2 && k >= 1)
    require(maxGapHours >= 1, "maxGapHours must be >= 1")
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + (t.getNanos / 1000L)
    val src =
      if (trailingSilence) buckets.withWatermark("hour", watermarkDelay)
      else buckets
    val timeout =
      if (trailingSilence) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (tpe: String, it: Iterator[RateBucket],
            state: GroupState[RateState]) => {
          var hist = state.getOption.map(_.buckets).getOrElse(Seq.empty)
          val out = Seq.newBuilder[RateVerdict]
          def fold(hourUs: Long, cnt: Long): Unit = {
            val n = hist.size.toLong
            val verdict =
              if (n < minWindow) None
              else {
                val s = hist.map(_._2).sum
                val q = hist.map(h => h._2 * h._2).sum
                val lhs = n * cnt - s
                Some(if (lhs * lhs > k.toLong * k * (n * q - s * s)) 1
                  else 0)
              }
            out += RateVerdict(tpe, hourUs, cnt, n, verdict)
            hist = (hist :+ (hourUs, cnt)).takeRight(windowHours)
          }
          // fold zeros for silent hours in (hist.last, untilUs]; the
          // per-fire cap bounds a watermark poisoned by another type
          def fillZeros(untilUs: Long): Unit = {
            var h = hist.last._1 + HourUs
            var left = maxGapHours
            while (h <= untilUs && left > 0) {
              fold(h, 0L); h += HourUs; left -= 1
            }
            if (h <= untilUs) gapDrops.foreach(_.add(1L))
          }
          if (state.hasTimedOut) {
            // silent type: the global watermark passed its next
            // expected hour — fold zeros up to and INCLUDING the
            // watermark. This is safe because Spark's late-record
            // filter for stateful ops drops rows AT the watermark too
            // (WatermarkSupport builds `eventTime <= watermark`, not
            // strictly-below — pinned empirically by the "exactly AT
            // the watermark" spec): an hour-aligned bucket landing
            // exactly on the watermark is undeliverable, so folding it
            // as zero shadows nothing a reader could ever have seen.
            // Parity contract: a type resuming with data at-or-below
            // the watermark of its silent period gets those hours as
            // zeros (the bucket is late by Spark's own rule); hours
            // strictly above the watermark always fold with real
            // counts.
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            if (hist.nonEmpty) fillZeros(wmUs)
          } else {
            it.toSeq.sortBy(b => micros(b.hour)).foreach { b =>
              val hUs = micros(b.hour)
              if (hist.nonEmpty && hUs <= hist.last._1)
                lateDrops.foreach(_.add(1L))
              else if (hist.nonEmpty &&
                  hUs - hist.last._1 > maxGapHours * HourUs)
                gapDrops.foreach(_.add(1L))
              else {
                // densify: fold the silent hours as zeros first
                if (hist.nonEmpty) fillZeros(hUs - HourUs)
                fold(hUs, b.cnt)
              }
            }
          }
          state.update(RateState(hist))
          if (trailingSilence && hist.nonEmpty) {
            // re-arm one hour past the newest folded bucket (clamped
            // above the current watermark — Spark rejects a timer at
            // or below it)
            val wmMs = state.getCurrentWatermarkMs()
            val nextMs = (hist.last._1 + HourUs) / 1000L
            state.setTimeoutTimestamp(math.max(nextMs, wmMs + 1L))
          }
          out.result().iterator
        })
  }

  /** Top-k per group via window ranking (no reference counterpart; the
    * canonical "top N per key" shape): 3 most frequent tokens per lang. */
  def topTokensPerLang(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(desc("cnt"), col("token"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .orderBy("lang", "rank")
  }
}
