package graft.operators

import graft.SparkSpec

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

  test("funnel totals are monotone non-increasing on the sf corpus") {
    val rows = Sessionize.funnel(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L))
    assert(rows.sliding(2).forall { case Seq(a, b) => a._3 >= b._3 },
      s"not monotone: $rows")
    assert(rows.head._3 > 0, "expected some users to reach step 1")
  }
}
