package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions.md5LongScala
import org.apache.spark.sql.functions._

/** Sketches (q137–q139): HLL registers/estimate against an independent
  * driver-side BigInt reference, the merge algebra, accuracy bounds,
  * Misra–Gries hand traces + the superset guarantee, and exact-output
  * parity for heavy hitters. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // —— independent HLL reference (plain Scala, no DataFrame plan) ——

  private def refJRho(v: String): (Long, Int) = {
    val h = md5LongScala("hll:" + v)
    val rest = h / Sketches.M
    val rho =
      if (rest == 0L) 60 - Sketches.P + 1
      else java.lang.Long.numberOfTrailingZeros(rest) + 1
    (h % Sketches.M, rho)
  }

  private def refRegisters(vs: Seq[String]): Map[Long, Int] =
    vs.map(refJRho).groupBy(_._1).view.mapValues(_.map(_._2).max).toMap

  private def refEstimate(regs: Map[Long, Int]): Long = {
    val m = Sketches.M
    val s = regs.values.map(r => BigInt(1) << (62 - r)).sum +
      (BigInt(m) - regs.size) * (BigInt(1) << 62)
    val raw = (BigInt(7213) * m * m * m * (BigInt(1) << 62)) /
      (BigInt(10000L * m + 10790) * s)
    val vz = m - regs.size
    if (vz > 0 && 2 * raw < BigInt(5 * m)) Sketches.LcTable(vz)
    else raw.toLong
  }

  test("hll registers equal the independent md5/trailing-zero reference") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
    val got = Sketches
      .hllRegisters(ev, Seq("event_type"), col("uid"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    val byType = ev.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
    val want = byType.flatMap { case (t, rows) =>
      refRegisters(rows.map(_._2).toSeq).map { case (j, rho) =>
        (t, j) -> rho
      }
    }
    assert(got == want)
  }

  test("register tables merge associatively: split halves re-aggregate " +
    "to the whole-corpus sketch") {
    val vs = (0 until 3000).map(i => s"user-$i")
    val (a, b) = vs.splitAt(1300)
    // duplicate overlap across the halves: unions must not double-count
    val regsA = refRegisters(a ++ b.take(200))
    val regsB = refRegisters(b)
    val merged = (regsA.keySet ++ regsB.keySet).map { j =>
      j -> math.max(regsA.getOrElse(j, 0), regsB.getOrElse(j, 0))
    }.toMap
    assert(merged == refRegisters(vs ++ b.take(200)))
    // and the relational hllMerge computes the same thing
    val df = (a.map(("x", _)) ++ b.map(("y", _))).toDF("half", "v")
    val regs = Sketches.hllRegisters(df, Seq("half"), col("v"))
    val got = Sketches
      .hllMerge(regs.withColumn("half", lit("ALL")), Seq("half"))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(got == refRegisters(vs))
  }

  test("hll estimate equals the BigInt reference on both the raw and " +
    "linear-counting paths") {
    // small scope → LC path; large scope → raw path
    val small = (0 until 80).map(i => ("s", s"v$i"))
    val large = (0 until 5000).map(i => ("l", s"v$i"))
    val df = (small ++ large).toDF("scope", "v")
    val est = Sketches
      .hllEstimate(
        Sketches.hllRegisters(df, Seq("scope"), col("v")), Seq("scope"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val refS = refEstimate(refRegisters(small.map(_._2)))
    val refL = refEstimate(refRegisters(large.map(_._2)))
    assert(est == Map("s" -> refS, "l" -> refL))
    // the small scope actually exercised linear counting: near-exact
    assert(math.abs(refS - 80) <= 8, s"LC estimate $refS far from 80")
    // the large scope is in the raw regime: within 3σ = 3·1.04/√256
    assert(math.abs(refL - 5000) <= 5000 * 20 / 100, s"raw $refL vs 5000")
  }

  test("q137 audit columns: estimate within 3 sigma of exact at sf") {
    val rows = Sketches.hllUsers(spark, sf).collect()
    graft.Caches.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact) <= math.max(2, exact * 20 / 100),
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("hll overlap: disjoint, nested, and partial intersections — " +
    "exact column is exact, I-E estimate tracks it within sketch error") {
    // a: 0..999; b: 500..1499 (overlap 500); c: 2000..2099 (disjoint
    // from both); d: 0..99 (subset of a)
    val ev = ((0 until 1000).map(i => ("a", i.toLong)) ++
      (500 until 1500).map(i => ("b", i.toLong)) ++
      (2000 until 2100).map(i => ("c", i.toLong)) ++
      (0 until 100).map(i => ("d", i.toLong)))
      .toDF("event_type", "user_id")
    val rows = Sketches.hllOverlapOn(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    graft.Caches.releaseAll()
    val exact = Map(("a", "b") -> 500L, ("a", "c") -> 0L,
      ("a", "d") -> 100L, ("b", "c") -> 0L, ("b", "d") -> 0L,
      ("c", "d") -> 0L)
    assert(rows.keySet == exact.keySet)
    for ((pair, (_, est, ex)) <- rows) {
      assert(ex == exact(pair), s"$pair exact")
      // I-E error ≤ ~3σ of the union size (σ = 6.5% of ≤2000): ±400
      assert(math.abs(est - ex) <= 400, s"$pair est=$est exact=$ex")
    }
    // the union estimate of the disjoint pair covers both sides
    val (uAC, _, _) = rows(("a", "c"))
    assert(uAC > 900, s"a∪c union_est=$uAC")
  }

  // —— histogram quantiles ——

  test("histQuantiles hand trace: the ceil-rank walk at both grids, " +
    "and the estimate brackets the exact value by one bucket") {
    // 100 values 0.5, 1.5, ..., 99.5 for type a: p50 → rank 50 →
    // value 49.5; bucket width 0.5 ⇒ est = floor(49.5e6/5e5)*5e5
    val ev = (0 until 100).map(i => ("a", i + 0.5)).toDF("event_type", "value")
    val row = Sketches.histQuantilesOn(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    graft.Caches.releaseAll()
    val a = row("a")
    assert(a.getLong(2) == 49500000L, s"p50 exact ${a.getLong(2)}")
    assert(a.getLong(1) == 49500000L, s"p50 est ${a.getLong(1)}")
    assert(a.getLong(4) == 94500000L && a.getLong(6) == 98500000L)
    // the ALL rollup over one type equals the type itself
    assert(row("ALL").toSeq.drop(1) == a.toSeq.drop(1))
  }

  test("histQuantiles on the sf corpus: every estimate lower-bounds " +
    "its exact value within one bucket width") {
    val rows = Sketches.histQuantiles(spark, sf).collect()
    graft.Caches.releaseAll()
    assert(rows.nonEmpty)
    for (r <- rows; qi <- Seq(1, 3, 5)) {
      val (est, exact) = (r.getLong(qi), r.getLong(qi + 1))
      assert(est <= exact && exact < est + Sketches.HistWidthMicros,
        s"${r.getString(0)} idx=$qi est=$est exact=$exact")
    }
  }

  // —— Misra–Gries / heavy hitters ——

  test("misra-gries hand trace: k=2 over a 3-symbol stream") {
    // stream 1 1 2 3 1 2: MG(k=2) — {1:2} {1:2,2:1} full→decrement on 3
    // → {1:1}, then {1:2} {1:2,2:1}; survivors {1,2}
    val out = Sketches
      .misraGries(Iterator(1L, 1L, 2L, 3L, 1L, 2L), k = 2).toSet
    assert(out == Set(1L, 2L))
    // all-distinct stream: the decrement on 3 cancels 1 and 2, so only
    // the trailing 4 survives
    val out2 = Sketches.misraGries(Iterator(1L, 2L, 3L, 4L), k = 2).toSet
    assert(out2 == Set(4L))
  }

  test("misra-gries superset guarantee: every key with freq > n/(k+1) " +
    "survives, under adversarial ordering") {
    val rnd = new scala.util.Random(13)
    // skewed stream: key i has weight ~ 1/(i+1)
    val stream = Seq.fill(5000)(math.min(99L,
      (math.pow(rnd.nextDouble(), 3) * 100).toLong))
    for (order <- Seq(stream, stream.sorted, stream.sortBy(-_))) {
      val k = 16
      val heavy = order.groupBy(identity).collect {
        case (x, xs) if xs.size > order.size / (k + 1) => x
      }.toSet
      val cand = Sketches.misraGries(order.iterator, k).toSet
      assert(heavy.subsetOf(cand),
        s"missing ${heavy -- cand} from MG candidates")
    }
  }

  test("heavyHittersOn equals the brute-force threshold count, at any " +
    "partitioning") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(4000)(
      (math.pow(rnd.nextDouble(), 2) * 50).toLong)
    val phiPpm = 30000L // 3%
    val brute = data.groupBy(identity).toSeq
      .collect { case (x, xs)
        if xs.size.toLong * 1000000L > data.size.toLong * phiPpm =>
        (x, xs.size.toLong)
      }
      .sortBy { case (x, c) => (-c, x) }
    for (parts <- Seq(1, 3, 32)) {
      val df = spark.createDataset(data).repartition(parts).toDF("item")
      val got = Sketches.heavyHittersOn(df, "item", phiPpm, k = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == brute, s"parts=$parts")
    }
  }

  test("heavy hitters guardrails: k too small for phi is refused") {
    val df = Seq(1L).toDF("item")
    intercept[IllegalArgumentException] {
      Sketches.heavyHittersOn(df, "item", phiPpm = 1000L, k = 64)
    }
    intercept[IllegalArgumentException] {
      Sketches.heavyHittersOn(df, "item", phiPpm = 0L, k = 64)
    }
    // the bound is CEILED: phi=30% needs k+1 >= 3.33, i.e. k >= 3 —
    // truncating division would wrongly accept k=2 and the MG pass
    // could silently drop a true heavy hitter
    intercept[IllegalArgumentException] {
      Sketches.heavyHittersOn(df, "item", phiPpm = 300000L, k = 2)
    }
    assert(Sketches.heavyHittersOn(df, "item", phiPpm = 300000L, k = 3)
      .collect().nonEmpty)
  }

  test("ceiled MG bound is tight: at phi just under a divisor boundary " +
    "the minimal ceiled k still catches every true heavy hitter") {
    // phi = 10500 ppm → kMin = 95 (k+1 = 96 ≥ 95.24). 60 items at 1.2%
    // (> phi) + filler: with k = 95 all must survive, exactly.
    val heavyIds = (0L until 60L)
    val data = heavyIds.flatMap(i => Seq.fill(120)(i)) ++
      (0 until 2800).map(i => 1000L + i)
    val df = spark.createDataset(data).toDF("item")
    val got = Sketches.heavyHittersOn(df, "item", phiPpm = 10500L, k = 95)
      .collect().map(_.getLong(0)).toSet
    assert(got == heavyIds.toSet)
  }

  // —— range rollup from day-grain registers (q152) ——

  test("range rollup identity: merging day-grain registers for a range " +
    "equals the sketch built from the range's rows, and excludes the " +
    "rest") {
    // 3 days; day 2 shares users with day 1, day 3 is disjoint
    val rows =
      (0L until 200L).map(u => ("view", "2024-01-01 10:00:00", u)) ++
      (100L until 300L).map(u => ("view", "2024-01-02 10:00:00", u)) ++
      (1000L until 1100L).map(u => ("view", "2024-01-03 10:00:00", u))
    val ev = rows.toDF("event_type", "tss", "user_id")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Sketches
      .hllUsersRangeOn(ev, "2024-01-01", "2024-01-02")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    graft.Caches.releaseAll()
    val want = Sketches.hllUsersOn(
        ev.where(col("ts") < to_timestamp(lit("2024-01-03 00:00:00"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    graft.Caches.releaseAll()
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // day 3's 100 disjoint users are really excluded from the exact
    assert(got.find(_._1 == "ALL").get._3 == 300L)
  }

  // —— auto-ranged histogram quantiles (q150) ——

  test("auto-grid quantiles: every estimate is the bucket lower bound " +
    "of its exact value (est <= exact < est + width), on real money") {
    val out = Sketches.priceQuantiles(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val width = r.getLong(2)
      for (i <- Seq(3, 5, 7)) { // (est, exact) column pairs
        val (est, exact) = (r.getLong(i), r.getLong(i + 1))
        assert(est <= exact && exact < est + width,
          s"${r.getString(0)}: est $est exact $exact width $width")
      }
    }
  }

  test("auto-grid degenerates exactly: a constant column gets width 1 " +
    "and estimate == exact") {
    val const = Seq.fill(500)(("P", 42.37)).toDF("o_orderpriority",
      "o_totalprice")
    val r = Sketches.priceQuantilesOn(const).collect()
    assert(r.length == 2) // the scope and its 'ALL' rollup
    r.foreach { row =>
      assert(row.getLong(2) == 1L, "constant column must get width 1")
      for (i <- Seq(3, 5, 7))
        assert(row.getLong(i) == row.getLong(i + 1) &&
          row.getLong(i) == 4237L)
    }
    graft.Caches.releaseAll()
  }

  // —— Count–Min sketch: independent plain-Scala reference ——

  private def refCmsRegs(items: Seq[Long]): Map[(Int, Long), Long] =
    items.flatMap(i => Sketches.cmsProbePositions(i))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def refCmsEst(regs: Map[(Int, Long), Long], item: Long): Long =
    Sketches.cmsProbePositions(item).map(p => regs.getOrElse(p, 0L)).min

  test("cms registers and estimates equal the independent md5 reference") {
    val data = (0 until 2000).map(i => (i * 7919L) % 37L) // skewed catalog
    val df = spark.createDataset(data).toDF("item")
    val gotRegs = Sketches.cmsRegisters(df, "item").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotRegs == refCmsRegs(data))
    val gotEst = Sketches.cmsCountsOn(df, "item").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = data.distinct
      .map(i => i -> refCmsEst(refCmsRegs(data), i)).toMap
    assert(gotEst == want)
  }

  test("cms error is one-sided: est >= exact for every catalog item, " +
    "and a never-seen item estimates 0 or collision mass only") {
    val out = Sketches.cmsCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (item, est, exact, err) =>
      assert(est >= exact && err == est - exact, s"item $item: $est < $exact")
    }
    // a probe far outside the catalog: its counters hold only
    // collision mass (possibly 0) — never negative, never a crash
    val regs = Sketches.cmsRegisters(
      graft.Tables.events(spark, sf)
        .select(get_json_object(col("props"), "$.k").cast("long")
          .as("item")).where(col("item").isNotNull), "item")
    val ghost = Sketches.cmsEstimates(regs,
      Seq(987654321L).toDF("item"), "item").collect().head.getLong(1)
    assert(ghost >= 0L)
  }

  test("cms registers merge additively: split halves sum-merge to the " +
    "whole-stream counters") {
    val data = (0 until 3000).map(i => (i * 131L) % 53L)
    val (a, b) = data.splitAt(1700)
    def regsOf(part: Seq[Long]) =
      Sketches.cmsRegisters(spark.createDataset(part).toDF("item"), "item")
    val merged = regsOf(a).union(regsOf(b))
      .groupBy("d", "w").agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == refCmsRegs(data))
  }

  // —— KMV (theta) sketch: independent plain-Scala reference ——

  private def refKmv(vs: Seq[String], k: Int): Seq[Long] =
    vs.map(v => md5LongScala("kmv:" + v)).distinct.sorted.take(k)

  private def refKmvEstimate(sketch: Seq[Long], k: Int): Long =
    if (sketch.size < k) sketch.size.toLong
    else ((BigInt(k - 1) * (BigInt(1) << 60)) /
      BigInt(math.max(sketch.max, 1L))).toLong

  test("kmv registers equal the independent min-k-distinct reference") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
    val got = Sketches
      .kmvRegisters(ev, "event_type", col("uid"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val want = ev.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(rows => refKmv(rows.map(_._2).toSeq, Sketches.DefaultKmvK))
      .toMap
    assert(got == want)
  }

  test("kmv sketches merge associatively: union of half-corpus sketches " +
    "re-tops-k to the whole-corpus sketch") {
    val vs = (0 until 3000).map(i => s"user-$i")
    val (a, b) = vs.splitAt(1300)
    def regsOf(part: Seq[String]) = Sketches.kmvRegisters(
      part.toDF("uid").withColumn("g", lit("all")), "g", col("uid"))
    val merged = Sketches
      .kmvTopK(regsOf(a).union(regsOf(b)), Seq("g"))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(merged == refKmv(vs, Sketches.DefaultKmvK))
  }

  test("kmv estimate: exact below k, BigInt-reference-equal and within " +
    "3 sigma above k") {
    val k = Sketches.DefaultKmvK
    // below k: the sketch saw the whole universe — answer is exact
    val small = (0 until 40).map(i => s"s-$i")
    val smallEst = Sketches.kmvEstimate(
      Sketches.kmvRegisters(
        small.toDF("uid").withColumn("g", lit("x")), "g", col("uid")),
      Seq("g"), k).collect().head.getLong(1)
    assert(smallEst == 40L)
    // above k: engine estimate is bit-equal to the independent
    // reference, and within 3/sqrt(k-2) of the truth (~38% at k=64)
    val n = 5000
    val big = (0 until n).map(i => s"u-$i")
    val est = Sketches.kmvEstimate(
      Sketches.kmvRegisters(
        big.toDF("uid").withColumn("g", lit("x")), "g", col("uid")),
      Seq("g"), k).collect().head.getLong(1)
    assert(est == refKmvEstimate(refKmv(big, k), k))
    val relErr = math.abs(est - n).toDouble / n
    assert(relErr <= 3.0 / math.sqrt(k - 2.0),
      s"kmv estimate $est vs $n: relErr $relErr")
  }

  test("minKDistinct is duplicate-proof: a re-seen hash at capacity " +
    "must not evict the current maximum") {
    // k=2, state {1,3}: feeding 3 again would evict 3 itself if the
    // add-then-poll pair ignored the failed insert
    val out = Sketches.minKDistinct(
      Iterator(("a", 5L), ("a", 3L), ("a", 1L), ("a", 3L)), 2).toSeq
    assert(out.map(_._2).sorted == Seq(1L, 3L))
  }

  test("theta overlap: membership counting reproduces the independent " +
    "reference on nested / partial / disjoint audiences") {
    val k = 16
    // a = {0..99}, b = {50..149} (partial), c = {200..219} (disjoint
    // from both, and below k so its sketch is complete)
    val rows =
      (0 until 100).map(i => ("a", i.toLong)) ++
      (50 until 150).map(i => ("b", i.toLong)) ++
      (200 until 220).map(i => ("c", i.toLong))
    val ev = rows.toDF("event_type", "user_id")
    val got = Sketches.kmvOverlapOn(ev, k).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // independent reference: sketches, union top-k, membership flags
    val byType = rows.groupBy(_._1).view
      .mapValues(_.map(_._2.toString)).toMap
    def pairRef(ta: String, tb: String) = {
      val sa = refKmv(byType(ta), k).toSet
      val sb = refKmv(byType(tb), k).toSet
      val ku = (sa ++ sb).toSeq.sorted.take(k)
      val matches = ku.count(h => sa(h) && sb(h))
      val unionEst = refKmvEstimate(ku, k)
      val exactA = byType(ta).distinct.map(_.toLong).toSet
      val exactB = byType(tb).distinct.map(_.toLong).toSet
      val ov = (exactA & exactB).size.toLong
      (unionEst,
        (BigInt(matches) * unionEst / ku.size).toLong,
        ov,
        (BigInt(matches) * 1000000 / ku.size).toLong,
        BigInt(ov) * 1000000 / (exactA.size + exactB.size - ov))
    }
    for (pair <- Seq(("a", "b"), ("a", "c"), ("b", "c"))) {
      val (ue, oe, ox, jp, jxp) = pairRef(pair._1, pair._2)
      assert(got(pair) == ((ue, oe, ox, jp, jxp.toLong)),
        s"pair $pair: got ${got(pair)}")
    }
    // the disjoint pairs must carry zero exact overlap
    assert(got(("a", "c"))._3 == 0L && got(("b", "c"))._3 == 0L)
  }
}
