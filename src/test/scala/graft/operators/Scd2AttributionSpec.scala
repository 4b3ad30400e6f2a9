package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Contracts for the round-10 additions: cluster-balanced diversity
  * sampling (q115), SCD Type-2 dimension history (q116), and first/
  * last-touch conversion attribution (q117).
  */
class Scd2AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // —— cluster-balanced sample (q115) ——

  test("clusterBalancedSample equals the window-rank formulation") {
    val cap = 2
    val got = Sampling.clusterBalancedSample(spark, sf, cap = cap)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val n = Tables.embeddings(spark, sf).count()
    val cents = IvfIndex.trainCached(spark, sf,
      Similarity.measuredCells(n), 3)
    val ref = IvfIndex.assign(Tables.embeddings(spark, sf), cents)
      .select(col("cell"), col("vec_id"),
        row_number().over(Window.partitionBy("cell")
          .orderBy(graft.functions.TextFunctions.md5Long(
            concat(lit("csamp:"), col("vec_id").cast("string"))),
            col("vec_id"))).as("rk"))
      .where(col("rk") <= cap)
      .orderBy("cell", "vec_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == ref)
  }

  test("clusterBalancedSample: per-cell counts bounded by cap; subset") {
    val cap = 3
    val kept = Sampling.clusterBalancedSample(spark, sf, cap = cap)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val perCell = kept.groupBy(_._1).view.mapValues(_.size)
    assert(perCell.values.forall(_ <= cap))
    val universe = Tables.embeddings(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.map(_._2).toSet.subsetOf(universe))
    assert(kept.map(_._2).distinct.size == kept.size) // no vec twice
  }

  // —— SCD Type-2 history (q116) ——

  private def historyOf(rows: Seq[(Long, Timestamp, Long, Option[Long])]) =
    Warehouse.scd2HistoryOn(
        rows.toDF("key", "ts", "seq", "attr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
        r.getLong(3), Option(r.get(4)), r.getInt(5)))
      .toSeq

  test("scd2: repeated values collapse; transitions chain validity") {
    val got = historyOf(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some(5L)),
      (1L, ts("2024-01-02 00:00:00"), 2L, Some(5L)), // repeat — no version
      (1L, ts("2024-01-03 00:00:00"), 3L, Some(7L)), // transition
      (1L, ts("2024-01-04 00:00:00"), 4L, Some(7L)), // repeat — no version
      (1L, ts("2024-01-05 00:00:00"), 5L, Some(5L)))) // back — transition
    def us(s: String): Long = ts(s).getTime * 1000L
    assert(got == Seq(
      (1L, 1L, Some(5L), us("2024-01-01 00:00:00"),
        Some(us("2024-01-03 00:00:00")), 0),
      (1L, 2L, Some(7L), us("2024-01-03 00:00:00"),
        Some(us("2024-01-05 00:00:00")), 0),
      (1L, 3L, Some(5L), us("2024-01-05 00:00:00"), None, 1)))
  }

  test("scd2: null attr is a value — null→x and x→null are transitions") {
    val got = historyOf(Seq(
      (2L, ts("2024-01-01 00:00:00"), 1L, None),
      (2L, ts("2024-01-02 00:00:00"), 2L, None),     // repeat of null
      (2L, ts("2024-01-03 00:00:00"), 3L, Some(4L)), // null → 4
      (2L, ts("2024-01-04 00:00:00"), 4L, None)))    // 4 → null
    assert(got.map(g => (g._2, g._3)) ==
      Seq((1L, None), (2L, Some(4L)), (3L, None)))
    assert(got.count(_._6 == 1) == 1 && got.last._6 == 1)
  }

  test("scd2: same-ts changes order by seq; keys are independent") {
    val got = historyOf(Seq(
      (3L, ts("2024-01-01 00:00:00"), 2L, Some(9L)), // later seq wins cur
      (3L, ts("2024-01-01 00:00:00"), 1L, Some(8L)),
      (4L, ts("2024-01-01 00:00:00"), 3L, Some(8L))))
    assert(got.map(g => (g._1, g._2, g._3, g._6)) == Seq(
      (3L, 1L, Some(8L), 0), (3L, 2L, Some(9L), 1),
      (4L, 1L, Some(8L), 1)))
  }

  test("scd2 equals the brute-force fold on random change logs") {
    val rnd = new scala.util.Random(31)
    // coarse ts → same-instant changes exercising the seq tie rule;
    // small attr domain → plenty of repeats; None is a value
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(7).toLong,
        ts(f"2024-01-01 10:00:${rnd.nextInt(40)}%02d"),
        i.toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(3).toLong))
    }
    val got = historyOf(rows)
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (key, evs) =>
        val sorted = evs.sortBy(e => (e._2.getTime, e._3))
        val trans = sorted.foldLeft(Seq.empty[(Timestamp, Option[Long])]) {
          (acc, e) =>
            if (acc.lastOption.exists(_._2 == e._4)) acc
            else acc :+ (e._2, e._4)
        }
        trans.zipWithIndex.map { case ((from, attr), i) =>
          val to = trans.lift(i + 1).map(_._1.getTime * 1000L)
          (key, i + 1L, attr, from.getTime * 1000L, to,
            if (to.isEmpty) 1 else 0)
        }
    }
    assert(got.map(g => (g._1, g._2, g._3.map(_.asInstanceOf[Long]),
      g._4, g._5.map(_.asInstanceOf[Long]), g._6)) == want)
  }

  // —— attribution (q117) ——

  private def attrOf(rows: Seq[(Long, Long, Timestamp, String)]) =
    Sessionize.attributionOn(
        rows.toDF("user_id", "event_id", "ts", "event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))
      .toSeq

  test("attribution: last = latest touch at-or-before, first = earliest") {
    val got = attrOf(Seq(
      (1L, 10L, ts("2024-01-01 01:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 02:00:00"), "click"),
      (1L, 12L, ts("2024-01-01 03:00:00"), "purchase"),
      (1L, 13L, ts("2024-01-01 04:00:00"), "view"),    // after — ignored
      (1L, 14L, ts("2024-01-01 05:00:00"), "purchase")))
    assert(got == Seq(
      (1L, 12L, Some(11L), Some("click"), Some(10L), Some("view")),
      (1L, 14L, Some(13L), Some("view"), Some(10L), Some("view"))))
  }

  test("attribution: no touch at-or-before → all nulls") {
    val got = attrOf(Seq(
      (2L, 20L, ts("2024-01-01 01:00:00"), "purchase"),
      (2L, 21L, ts("2024-01-01 02:00:00"), "click")))
    assert(got == Seq((2L, 20L, None, None, None, None)))
  }

  test("attribution: same-instant touch counts; max event_id wins last") {
    val t0 = ts("2024-01-01 01:00:00")
    val got = attrOf(Seq(
      (3L, 30L, t0, "view"),
      (3L, 31L, t0, "click"), // same ts — larger event_id is the last
      (3L, 32L, t0, "purchase")))
    assert(got == Seq(
      (3L, 32L, Some(31L), Some("click"), Some(30L), Some("view"))))
  }

  test("attribution equals the brute-force reference on random logs") {
    val rnd = new scala.util.Random(42)
    val types = Seq("click", "view", "purchase", "error", "signup")
    val rows = (0 until 400).map { i =>
      // few users + coarse ts → plenty of same-instant collisions
      (rnd.nextInt(6).toLong, i.toLong,
        new Timestamp(1704067200000L + rnd.nextInt(120) * 1000L),
        types(rnd.nextInt(types.length)))
    }
    val got = attrOf(rows)
    val want = rows.filter(_._4 == "purchase").map { p =>
      val cand = rows.filter(r => r._1 == p._1 &&
        (r._4 == "click" || r._4 == "view") && !r._3.after(p._3))
      def key(r: (Long, Long, Timestamp, String)) = (r._3.getTime, r._2)
      val last = if (cand.isEmpty) None else Some(cand.maxBy(key))
      val first = if (cand.isEmpty) None else Some(cand.minBy(key))
      (p._1, p._2, last.map(_._2), last.map(_._4),
        first.map(_._2), first.map(_._4))
    }.sortBy(p => (p._1, p._2))
    assert(got.map(g => (g._1, g._2,
      g._3.map(_.asInstanceOf[Long]), g._4.map(_.asInstanceOf[String]),
      g._5.map(_.asInstanceOf[Long]), g._6.map(_.asInstanceOf[String])))
      == want)
  }

  test("attribution: users are independent; other types are not touches") {
    val got = attrOf(Seq(
      (4L, 40L, ts("2024-01-01 01:00:00"), "click"),
      (5L, 50L, ts("2024-01-01 01:30:00"), "error"),  // not a touch
      (5L, 51L, ts("2024-01-01 02:00:00"), "purchase")))
    assert(got == Seq((5L, 51L, None, None, None, None)))
  }
}
