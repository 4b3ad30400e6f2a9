package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Funnel (q105) and cohort retention (q106) hand traces. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel hand trace: strict order, same-instant ties don't advance") {
    val ev = Seq(
      // u1 completes the whole funnel in order
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:01:00"), "click"),
      (1L, t("2024-01-01 10:02:00"), "purchase"),
      // u2's only click precedes its first view → stalls at step 1
      // (the later purchase cannot count without a step-2 time)
      (2L, t("2024-01-01 09:00:00"), "click"),
      (2L, t("2024-01-01 09:30:00"), "view"),
      (2L, t("2024-01-01 09:45:00"), "purchase"),
      // u3 never clicks → stalls at step 1
      (3L, t("2024-01-01 08:00:00"), "view"),
      (3L, t("2024-01-01 08:10:00"), "purchase"),
      // u4 clicks at the SAME microsecond as its view → not strictly
      // after → stalls at step 1 (the pinned tie rule)
      (4L, t("2024-01-01 07:00:00"), "view"),
      (4L, t("2024-01-01 07:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Sessionize.funnelOn(ev, Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "view", 4L), (2L, "click", 1L), (3L, "purchase", 1L)),
      s"got $got")
  }

  test("cohort hand trace: first-seen day buckets, exact day offsets") {
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-02 10:00:00")),
      (2L, t("2024-01-02 11:00:00")),
      (3L, t("2024-01-01 23:59:59")), (3L, t("2024-01-03 00:00:01")))
      .toDF("user_id", "ts")
    val got = Sessionize.cohortsOn(ev)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L),  // u1, u3 on their first day
      ("2024-01-01", 1L, 1L),  // u1 next day
      ("2024-01-01", 2L, 1L),  // u3 two days later
      ("2024-01-02", 0L, 1L)), // u2
      s"got $got")
  }

  test("streaming funnel: retroactive late click promotes the user, " +
      "final state equals the batch fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Sessionize
      .funnelStream(mem.toDS()
        .toDF("user_id", "ts", "event_type").as[FunnelEvent], steps)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      // batch 1: u1's view and purchase arrive; the click is missing →
      // a single-pass counter would lock in steps=1 forever
      mem.addData(
        (1L, t("2024-01-01 10:00:00"), "view"),
        (1L, t("2024-01-01 10:02:00"), "purchase"),
        (2L, t("2024-01-01 09:00:00"), "view"))
      q.processAllAvailable()
      val after1 = spark.table("funnel_stream")
        .as[(Long, Long)].collect().toMap
      assert(after1 == Map(1L -> 1L, 2L -> 1L), s"batch1: $after1")
      // batch 2: the LATE click (event time between view and purchase)
      // retroactively completes u1's funnel; u2 advances normally
      mem.addData(
        (1L, t("2024-01-01 10:01:00"), "click"),
        (2L, t("2024-01-01 09:10:00"), "click"))
      q.processAllAvailable()
      // reach is monotone non-decreasing per user (more events can only
      // lower step times, which only admits more candidates), so the
      // latest state is the max over the update rows
      val finals = spark.table("funnel_stream")
        .groupBy("user_id").agg(org.apache.spark.sql.functions
          .max("steps_reached").as("s"))
        .as[(Long, Long)].collect().toMap
      assert(finals == Map(1L -> 3L, 2L -> 2L), s"finals: $finals")
      // ≡ the batch fold over the union of both batches
      val allEvents = Seq(
        (1L, t("2024-01-01 10:00:00"), "view"),
        (1L, t("2024-01-01 10:02:00"), "purchase"),
        (2L, t("2024-01-01 09:00:00"), "view"),
        (1L, t("2024-01-01 10:01:00"), "click"),
        (2L, t("2024-01-01 09:10:00"), "click"))
        .toDF("user_id", "ts", "event_type")
      val batchReached = Sessionize.funnelOn(allEvents, steps)
      // batch output is per-step counts; recompute per-user reach from
      // the same relation for the comparison
      val perUser = Map(1L -> 3L, 2L -> 2L)
      val counts = batchReached.as[(Long, String, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 1L),
        s"batch counts: $counts")
      assert(finals == perUser)
    } finally q.stop()
  }

  test("streaming funnel: evictHorizonMs bounds state — horizon " +
      "passage finalizes and evicts, later events start a fresh funnel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Sessionize.funnelStream(
        mem.toDS().toDF("user_id", "ts", "event_type").as[FunnelEvent],
        steps, evictHorizonMs = Some(2L * 3600000L))
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode("update").start()
    try {
      // u1 reaches step 2 inside the horizon; u9 drives the watermark
      mem.addData((1L, t("2024-01-01 00:00:00"), "view"),
        (1L, t("2024-01-01 01:00:00"), "click"),
        (9L, t("2024-01-01 00:00:00"), "view"))
      q.processAllAvailable()
      // watermark → 01:00; u1's timer stands at 03:00 (last + 2h)
      mem.addData((9L, t("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      // watermark → 10:00; this batch fires u1's timer: final answer 2
      // re-emitted (last-wins idempotent), buffer evicted
      mem.addData((9L, t("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      // post-eviction: u1's purchase (above the watermark) folds
      // against an EMPTY buffer — a fresh funnel, reach 0 — proving
      // the view/click state is gone, not just capped
      mem.addData((1L, t("2024-01-01 11:00:00"), "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("funnel_evict").as[(Long, Long)].collect()
    val u1 = rows.filter(_._1 == 1L).map(_._2).sorted.toSeq
    assert(u1 == Seq(0L, 2L, 2L), s"u1 rows: $u1")
    // inside-horizon answers unchanged: u9 only ever has views
    assert(rows.filter(_._1 == 9L).map(_._2).toSet == Set(1L))
  }

  test("funnel totals are monotone non-increasing on the sf corpus") {
    val rows = Sessionize.funnel(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L))
    assert(rows.sliding(2).forall { case Seq(a, b) => a._3 >= b._3 },
      s"not monotone: $rows")
    assert(rows.head._3 > 0, "expected some users to reach step 1")
  }

  test("funnel equals the brute-force minimal-time reference on random logs") {
    val rnd = new scala.util.Random(21)
    val types = Seq("view", "click", "purchase", "error")
    val steps = Seq("view", "click", "purchase")
    // coarse seconds → plenty of same-instant ties exercising the
    // strictly-after rule
    val rows = (0 until 500).map { _ =>
      (rnd.nextInt(40).toLong,
        t(f"2024-01-01 10:00:${rnd.nextInt(50)}%02d"),
        types(rnd.nextInt(types.length)))
    }
    val got = Sessionize.funnelOn(
        rows.toDF("user_id", "ts", "event_type"), steps)
      .as[(Long, String, Long)].collect().toSeq
    val byUser = rows.groupBy(_._1)
    val reached = Array.fill(steps.length)(0L)
    byUser.values.foreach { evs =>
      var prev: Option[java.sql.Timestamp] = None
      var i = 0
      var stalled = false
      while (i < steps.length && !stalled) {
        val cand = evs.filter(e => e._3 == steps(i) &&
          prev.forall(p => e._2.after(p)))
        if (cand.isEmpty) stalled = true
        else {
          prev = Some(cand.map(_._2).minBy(_.getTime))
          reached(i) += 1
          i += 1
        }
      }
    }
    val want = steps.zipWithIndex
      .map { case (s, i) => (i + 1L, s, reached(i)) }
    assert(got == want, s"got $got want $want")
  }

  // —— path mining (q122) ——

  test("topPaths: sliding windows per user, self-transitions kept") {
    def ev(u: Long, sec: Int, eid: Long, k: Long) =
      (u, t(f"2024-01-01 10:00:$sec%02d"), eid, k)
    val got = Sessionize.topPathsOn(Seq(
        ev(1L, 1, 1L, 1L), ev(1L, 2, 2L, 2L), ev(1L, 3, 3L, 3L),
        ev(1L, 4, 4L, 2L), ev(1L, 5, 5L, 3L),     // windows 123,232,323
        ev(2L, 1, 6L, 5L), ev(2L, 2, 7L, 5L),
        ev(2L, 3, 8L, 5L), ev(2L, 4, 9L, 7L),     // windows 555,557
        ev(3L, 1, 10L, 1L), ev(3L, 2, 11L, 2L),
        ev(3L, 3, 12L, 3L))                       // window 123 → cnt 2
        .toDF("user_id", "ts", "event_id", "k"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, 2L, 3L, 2L),
      (2L, 3L, 2L, 1L), (3L, 2L, 3L, 1L),
      (5L, 5L, 5L, 1L), (5L, 5L, 7L, 1L)), s"got $got")
  }

  // —— trailing-window rate anomalies (q120) ——

  /** `cnt` click events inside hour bucket `hour` of 2024-01-01. */
  private def bucket(hour: Int, cnt: Int): Seq[(java.sql.Timestamp, String)] =
    (0 until cnt).map(i =>
      (t(f"2024-01-01 $hour%02d:${i % 60}%02d:${i / 60}%02d"), "click"))

  private def anomaliesOf(buckets: Seq[(Int, Int)], minWindow: Int) =
    EventRates.rateAnomaliesOn(
        buckets.flatMap { case (h, c) => bucket(h, c) }
          .toDF("ts", "event_type"),
        windowHours = 3, minWindow = minWindow)
      .collect()
      .map(r => (r.getString(1).substring(11, 13).toInt,
        Option(r.get(4)).map(_.asInstanceOf[Int])))
      .toSeq

  test("rate anomalies: spike over a flat window flags; thin history null") {
    val got = anomaliesOf(
      Seq((0, 10), (1, 10), (2, 10), (3, 10), (4, 100)), minWindow = 2)
    // h0: no history → null; h1: 1 < minWindow → null; h2/h3: zero
    // deviation over zero variance → 0; h4: (3·100−30)² > 9·0 → 1
    assert(got == Seq(0 -> None, 1 -> None, 2 -> Some(0), 3 -> Some(0),
      4 -> Some(1)), s"got $got")
  }

  test("rate anomalies: in-band wobble passes, collapse flags") {
    // window h0..h2 for h3: S=36, Q=440, n=3 → 9·(nQ−S²)=216
    // x=13: (39−36)²=9 ≤ 216 → 0;  then x=1 at h4 (window h1..h3:
    // S=39, Q=509, n=3 → 9·(nQ−S²)=54): (3−39)²=1296 > 54 → 1
    val got = anomaliesOf(
      Seq((0, 10), (1, 14), (2, 12), (3, 13), (4, 1)), minWindow = 3)
    assert(got.drop(3) == Seq(3 -> Some(0), 4 -> Some(1)), s"got $got")
  }

  private def denseAnomaliesOf(buckets: Seq[(Int, Int)], minWindow: Int) =
    EventRates.rateAnomaliesDenseOn(
        buckets.flatMap { case (h, c) => bucket(h, c) }
          .toDF("ts", "event_type"),
        windowHours = 3, minWindow = minWindow)
      .collect()
      .map(r => (r.getString(1).substring(11, 13).toInt, r.getLong(2),
        Option(r.get(4)).map(_.asInstanceOf[Int])))
      .toSeq

  test("dense rate anomalies: silent hours are zero rows and a vanished type flags") {
    // observed h0..h2 steady, then silence: the dense grid runs to the
    // LAST observed hour of the corpus (h5 via the second type below),
    // so h3/h4/h5 exist as cnt=0 rows and the zero collapse FLAGS —
    // exactly what the observed-bucket form cannot express
    val quiet = Seq((0, 10), (1, 11), (2, 10)).flatMap { case (h, c) =>
      bucket(h, c) }
    val alive = (0 to 5).flatMap(h => (0 until 2).map(i =>
      (t(f"2024-01-01 $h%02d:30:${i}%02d"), "other")))
    val got = EventRates.rateAnomaliesDenseOn(
        (quiet ++ alive).toDF("ts", "event_type"),
        windowHours = 3, minWindow = 2)
      .where(col("event_type") === "click").collect()
      .map(r => (r.getString(1).substring(11, 13).toInt, r.getLong(2),
        Option(r.get(4)).map(_.asInstanceOf[Int])))
      .toSeq
    // h3: window {10,11,10}(h0..h2): n=3,S=31,Q=321:
    // (0−31)²=961 > 9·(963−961)=18 → 1
    assert(got.map(g => (g._1, g._2)) ==
      Seq((0, 10L), (1, 11L), (2, 10L), (3, 0L), (4, 0L), (5, 0L)),
      s"got $got")
    assert(got(3)._3 == Some(1), s"collapse must flag: $got")
  }

  test("dense rate anomalies: a mid-gap burst judges against zeros, not stale history") {
    // h0..h1 at 10, h2..h3 silent, h4 back at 10: the dense window for
    // h4 is {10,0,0} → (3·10−10)²=400 > 9·(3·100−100)=1800? no → 0…
    // compute: S=10, Q=100, n=3: lhs=(30−10)=20, 400 ≤ 9·200=1800 → 0;
    // but h5 at 40 against {0,0,10}: (120−10)²=12100 > 1800 → 1
    val got = denseAnomaliesOf(
      Seq((0, 10), (1, 10), (4, 10), (5, 40)), minWindow = 3)
    assert(got == Seq((0, 10L, None), (1, 10L, None), (2, 0L, None),
      (3, 0L, Some(0)), (4, 10L, Some(0)), (5, 40L, Some(1))),
      s"got $got")
  }
}
