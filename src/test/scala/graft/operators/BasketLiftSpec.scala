package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Market-basket lift (q132): hand trace with exact fixed-point
  * values, cap semantics, and brute-force parity on random engagement
  * logs (driver-side BigInt — independent of the relational plan). */
class BasketLiftSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def lift(ev: Seq[(Long, Long)], minCount: Long = 1L,
      topK: Int = 1000, maxBasket: Int = Sessionize.MaxBasket)
      : Seq[(Long, Long, Long, Long)] = {
    val out = Sessionize
      .basketLiftOn(ev.toDF("user_id", "k"), minCount, topK, maxBasket)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    graft.Caches.releaseAll()
    out
  }

  /** Brute reference: plain Scala sets + BigInt fixed point. */
  private def brute(ev: Seq[(Long, Long)], minCount: Long = 1L,
      topK: Int = 1000, maxBasket: Int = Sessionize.MaxBasket)
      : Seq[(Long, Long, Long, Long)] = {
    val baskets = ev.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted)
      .filter(_._2.size <= maxBasket).toMap
    val u = baskets.size.toLong
    val ic = baskets.values.flatten.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    val pc = baskets.values.flatMap { items =>
      for (i <- items.indices; j <- i + 1 until items.size)
        yield (items(i), items(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    pc.toSeq.collect { case ((a, b), n) if n >= minCount =>
      (a, b, n, (BigInt(n) * u * 1000000 / (BigInt(ic(a)) * ic(b))).toLong)
    }.sortBy { case (a, b, _, l) => (-l, a, b) }.take(topK)
  }

  test("hand trace: exact lift_ppm, tie broken by (a, b)") {
    // baskets: u1{10,20,30} u2{10,20} u3{20,30} u4{10,20,30} u5{99};
    // U=5, item counts 10→3 20→4 30→3 99→1; duplicate events collapse
    val ev = Seq(1L -> 10L, 1L -> 20L, 1L -> 30L, 1L -> 10L,
      2L -> 10L, 2L -> 20L, 3L -> 20L, 3L -> 30L,
      4L -> 10L, 4L -> 20L, 4L -> 30L, 5L -> 99L)
    assert(lift(ev) === Seq(
      (10L, 20L, 3L, 1250000L),   // (3·5·10⁶) div (3·4)
      (20L, 30L, 3L, 1250000L),   // tie with the above → (a,b) order
      (10L, 30L, 2L, 1111111L)))  // (2·5·10⁶) div 9
  }

  test("the basket cap drops the power user everywhere (U, counts, pairs)") {
    val bot = (1L to 5L).map(k => 9L -> k) // |basket| 5 > cap 4
    val ev = Seq(1L -> 10L, 1L -> 20L, 2L -> 10L, 2L -> 20L) ++ bot
    // without the bot: U=2, n_10=n_20=2, pair (10,20) n_ab=2 → lift 10⁶
    assert(lift(ev, maxBasket = 4) === Seq((10L, 20L, 2L, 1000000L)))
    assert(lift(ev, maxBasket = 5) === brute(ev, maxBasket = 5))
  }

  test("minCount filters before ranking; invalid args are refused") {
    val ev = Seq(1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L, 3L -> 1L, 3L -> 3L)
    assert(lift(ev, minCount = 2L).map(p => (p._1, p._2)) === Seq((1L, 2L)))
    intercept[IllegalArgumentException] { lift(ev, minCount = 0L) }
    intercept[IllegalArgumentException] { lift(ev, topK = 0) }
    intercept[IllegalArgumentException] { lift(ev, maxBasket = 1) }
  }

  private def rules(ev: Seq[(Long, Long)], minCount: Long = 1L,
      topK: Int = 1000, maxBasket: Int = Sessionize.MaxBasket)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val out = Sessionize
      .basketRulesOn(ev.toDF("user_id", "k"), minCount, topK, maxBasket)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    graft.Caches.releaseAll()
    out
  }

  /** Brute rules: both directions of every supported pair, BigInt. */
  private def bruteRules(ev: Seq[(Long, Long)], minCount: Long = 1L,
      topK: Int = 1000, maxBasket: Int = Sessionize.MaxBasket)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val baskets = ev.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted)
      .filter(_._2.size <= maxBasket).toMap
    val u = baskets.size.toLong
    val ic = baskets.values.flatten.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    val pc = baskets.values.flatMap { items =>
      for (i <- items.indices; j <- i + 1 until items.size)
        yield (items(i), items(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    pc.toSeq.collect { case ((a, b), n) if n >= minCount =>
      Seq((a, b, n), (b, a, n))
    }.flatten.map { case (ant, cons, n) =>
      (ant, cons, n,
        (BigInt(n) * 1000000 / ic(ant)).toLong,
        (BigInt(n) * u * 1000000 / (BigInt(ic(ant)) * ic(cons))).toLong)
    }.sortBy { case (ant, cons, _, c, _) => (-c, ant, cons) }.take(topK)
  }

  test("q133 hand trace: directional confidence, symmetric lift") {
    val ev = Seq(1L -> 10L, 1L -> 20L, 1L -> 30L,
      2L -> 10L, 2L -> 20L, 3L -> 20L, 3L -> 30L,
      4L -> 10L, 4L -> 20L, 4L -> 30L, 5L -> 99L)
    // same baskets as the lift trace; confidence divides by the
    // ANTECEDENT count, so 10⇒20 (3/3) ≠ 20⇒10 (3/4)
    assert(rules(ev) === Seq(
      (10L, 20L, 3L, 1000000L, 1250000L),
      (30L, 20L, 3L, 1000000L, 1250000L),
      (20L, 10L, 3L, 750000L, 1250000L),
      (20L, 30L, 3L, 750000L, 1250000L),
      (10L, 30L, 2L, 666666L, 1111111L),
      (30L, 10L, 2L, 666666L, 1111111L)))
  }

  test("q133 random logs match the BigInt brute") {
    val pair = for {
      u <- Gen.chooseNum(1L, 12L)
      k <- Gen.chooseNum(1L, 8L)
    } yield (u, k)
    val log = Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n, pair))
    for (ev <- samples(log, 6); cap <- Seq(3, 8)) {
      assert(rules(ev, maxBasket = cap) === bruteRules(ev, maxBasket = cap),
        s"cap=$cap ev=$ev")
    }
  }

  test("random engagement logs match the BigInt brute") {
    val pair = for {
      u <- Gen.chooseNum(1L, 12L)
      k <- Gen.chooseNum(1L, 8L)
    } yield (u, k)
    val log = Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n, pair))
    for (ev <- samples(log, 8); cap <- Seq(3, 8)) {
      assert(lift(ev, maxBasket = cap) === brute(ev, maxBasket = cap),
        s"cap=$cap ev=$ev")
    }
  }
}
