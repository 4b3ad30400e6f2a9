package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Data-quality report (q143): the FAILING paths — every metric must
  * move, exactly, when its defect is planted — plus the clean-corpus
  * sanity run. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(df: org.apache.spark.sql.DataFrame)
      : Map[(String, String), Long] =
    df.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("planted defects move exactly their metric: null key, dup key, " +
    "empty type, negative value, bad discount, orphan FKs") {
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    // 10 events: 1 null user, 1 empty type, 2 negative values, and a
    // duplicated event_id (9 distinct / 10)
    val ev = Seq(
      (1L, ts(1), Some(10L), "view", 5.0),
      (2L, ts(2), Some(11L), "view", -1.0),
      (2L, ts(3), Some(12L), "click", 2.0),
      (4L, ts(4), None: Option[Long], "click", 3.0),
      (5L, ts(5), Some(13L), "", 4.0),
      (6L, ts(6), Some(14L), "buy", -0.5),
      (7L, ts(7), Some(15L), "view", 0.0),
      (8L, ts(8), Some(16L), "view", 1.0),
      (9L, ts(9), Some(17L), "view", 1.0),
      (10L, ts(10), Some(18L), "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // 4 orders: one zero price, one dup key, one orphan custkey
    val orders = Seq(
      (100L, 1L, 50.0), (101L, 2L, 0.0), (101L, 1L, 7.0), (103L, 99L, 9.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    // 5 lineitems: one zero qty, one discount out of unit, two orphans
    val lineitem = Seq(
      (100L, 1.0, 0.1), (101L, 0.0, 0.05), (101L, 2.0, 1.5),
      (999L, 1.0, 0.0), (998L, 3.0, 0.2))
      .toDF("l_orderkey", "l_quantity", "l_discount")
    val customer = Seq(1L, 2L).toDF("c_custkey")

    val m = metrics(Checks.qualityReportOn(ev, orders, lineitem, customer))
    assert(m(("events", "rows")) == 10L)
    assert(m(("events", "event_id_unique_ppm")) == 900000L)
    assert(m(("events", "user_id_complete_ppm")) == 900000L)
    assert(m(("events", "event_type_complete_ppm")) == 900000L)
    assert(m(("events", "value_nonneg_ppm")) == 800000L)
    assert(m(("events", "max_ts_micros")) == 1700000010000000L)
    assert(m(("orders", "rows")) == 4L)
    assert(m(("orders", "o_orderkey_unique_ppm")) == 750000L)
    assert(m(("orders", "totalprice_positive_ppm")) == 750000L)
    assert(m(("orders", "orphan_custkey")) == 1L)
    assert(m(("lineitem", "rows")) == 5L)
    assert(m(("lineitem", "quantity_positive_ppm")) == 800000L)
    assert(m(("lineitem", "discount_in_unit_ppm")) == 800000L)
    assert(m(("lineitem", "orphan_orderkey")) == 2L)
  }

  test("clean fixture: every ppm gate is exactly 1e6 and orphans are 0") {
    val m = metrics(Checks.qualityReport(spark, sf))
    m.collect { case ((_, met), v) if met.endsWith("_ppm") =>
      assert(v == 1000000L, s"$met = $v")
    }
    assert(m(("orders", "orphan_custkey")) == 0L)
    assert(m(("lineitem", "orphan_orderkey")) == 0L)
  }
}
