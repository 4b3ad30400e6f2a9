package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interval-overlap join (q141): hand traces of the cell machinery
  * (closed endpoints, cross-cell spans, first-shared-cell dedup),
  * brute-force parity on random interval sets — keyed and unkeyed —
  * and the plan guarantee that the overlap never becomes a
  * nested-loop/cartesian product. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def join(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)],
      keyed: Boolean, cell: Long): Set[(Long, Long)] = {
    // (id, lo, hi) triples; constant key 0 for the keyed case
    val lf0 = ls.toDF("a_id", "a_lo", "a_hi")
    val rf0 = rs.toDF("b_id", "b_lo", "b_hi")
    val (lf, rf) =
      if (keyed) (lf0.withColumn("k", lit(0L)), rf0.withColumn("k", lit(0L)))
      else (lf0, rf0)
    val keys = if (keyed) Seq("k") else Seq.empty[String]
    IntervalJoin.overlapJoin(lf, rf, keys, "a_lo", "a_hi", "b_lo", "b_hi",
      cell)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def brute(ls: Seq[(Long, Long, Long)],
      rs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (ai, alo, ahi) <- ls if alo <= ahi
      (bi, blo, bhi) <- rs if blo <= bhi
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).toSet

  test("hand trace: closed endpoints touch, nesting, disjoint, and a " +
    "span crossing many cells emits each pair exactly once") {
    val ls = Seq((1L, 0L, 10L), (2L, 25L, 30L), (3L, 5L, 95L))
    val rs = Seq((10L, 10L, 12L), (11L, 31L, 40L), (12L, 50L, 60L))
    // 1–10: touch at 10 (closed ⇒ overlap); 2–11: 30 < 31 disjoint;
    // 3 spans ten cells at width 10 and overlaps 10, 11, 12
    val want = Set((1L, 10L), (3L, 10L), (3L, 11L), (3L, 12L))
    for (cell <- Seq(1L, 7L, 10L, 1000L))
      assert(join(ls, rs, keyed = false, cell) == want, s"cell=$cell")
    // pair MULTIPLICITY, not just the set: no cross-cell double-emits
    val lf = ls.toDF("a_id", "a_lo", "a_hi")
    val rf = rs.toDF("b_id", "b_lo", "b_hi")
    val cnt = IntervalJoin
      .overlapJoin(lf, rf, Nil, "a_lo", "a_hi", "b_lo", "b_hi", 7L)
      .groupBy("a_id", "b_id").count().where(col("count") > 1).count()
    assert(cnt == 0, "a pair was emitted from more than one cell")
  }

  test("random interval sets match the brute-force overlap, keyed and " +
    "unkeyed, at several cell widths; invalid intervals drop") {
    val rnd = new scala.util.Random(41)
    def gen(n: Int) = (0 until n).map { i =>
      val lo = rnd.nextInt(500).toLong
      // ~10% invalid (hi < lo) — must be dropped, like the oracle side
      val hi = lo + rnd.nextInt(40).toLong - 4L
      (i.toLong, lo, hi)
    }
    val (ls, rs) = (gen(120), gen(150))
    val want = brute(ls, rs)
    for (cell <- Seq(3L, 16L, 64L, 10000L))
      assert(join(ls, rs, keyed = false, cell) == want, s"cell=$cell")
    // keyed: same sets on key 0 — identical answer through the keyed path
    assert(join(ls, rs, keyed = true, 16L) == want)
  }

  test("negative axes are exact: floor-division cells keep pre-epoch " +
    "coordinates correct instead of aliasing around zero or dropping") {
    // hand case straddling zero: [-5, 3] overlaps [-2, -1] and [0, 7];
    // truncate-toward-zero cells would merge cells -1 and 0
    val ls = Seq((1L, -5L, 3L), (2L, -30L, -20L))
    val rs = Seq((10L, -2L, -1L), (11L, 0L, 7L), (12L, -21L, -19L))
    val want = Set((1L, 10L), (1L, 11L), (2L, 12L))
    for (cell <- Seq(1L, 4L, 7L, 100L))
      assert(join(ls, rs, keyed = false, cell) == want, s"cell=$cell")
    // randomized parity on a signed axis, multiplicity included
    val rnd = new scala.util.Random(17)
    def gen(n: Int) = (0 until n).map { i =>
      val lo = rnd.nextInt(400).toLong - 200L
      (i.toLong, lo, lo + rnd.nextInt(30).toLong)
    }
    val (la, rb) = (gen(100), gen(120))
    for (cell <- Seq(3L, 16L, 1000L))
      assert(join(la, rb, keyed = false, cell) == brute(la, rb),
        s"cell=$cell")
    val dup = IntervalJoin.overlapJoin(
      la.toDF("a_id", "a_lo", "a_hi"), rb.toDF("b_id", "b_lo", "b_hi"),
      Nil, "a_lo", "a_hi", "b_lo", "b_hi", 16L)
      .groupBy("a_id", "b_id").count().where(col("count") > 1).count()
    assert(dup == 0, "a negative-axis pair was emitted twice")
  }

  test("the plan is an equi-join on (keys, cell): no nested-loop, no " +
    "cartesian, for the unkeyed case included") {
    val lf = (0 until 50).map(i => (i.toLong, i.toLong * 3, i.toLong * 3 + 10))
      .toDF("a_id", "a_lo", "a_hi")
    val rf = (0 until 50).map(i => (i.toLong, i.toLong * 2, i.toLong * 2 + 5))
      .toDF("b_id", "b_lo", "b_hi")
    val plan = IntervalJoin
      .overlapJoin(lf, rf, Nil, "a_lo", "a_hi", "b_lo", "b_hi", 8L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("q141 window canonicalization: inverted synthetic windows are " +
    "least/greatest-normalized, never dropped") {
    val ow = IntervalJoin.orderWindows(spark, sf)
    graft.Caches.releaseAll()
    val bad = ow.where(col("lo") > col("hi")).count()
    assert(bad == 0, s"$bad inverted windows survived canonicalization")
    assert(ow.count() ==
      graft.Tables.orders(spark, sf).join(
        graft.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey").distinct().count(),
      "every order with lineitems gets exactly one window")
  }
}
