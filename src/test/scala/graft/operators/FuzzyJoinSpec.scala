package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Edit-distance fuzzy self-join (q102): candidate completeness across
  * both filter paths, quotient expansion, and the distance contract. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def run(rows: Seq[(Long, String)], maxDist: Int = 2)
      : Set[(Long, Long, Long)] = {
    val out = FuzzyJoin
      .fuzzyPairsOn(rows.toDF("key", "name"), maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.Caches.releaseAll()
    out
  }

  /** Brute-force reference: same `levenshtein` the operator verifies
    * with, applied to EVERY pair — what the filter stack must equal. */
  private def brute(rows: Seq[(Long, String)], maxDist: Int = 2)
      : Set[(Long, Long, Long)] =
    rows.toDF("key", "name").as("a")
      .crossJoin(rows.toDF("key", "name").as("b"))
      .where(col("a.key") < col("b.key"))
      .select(col("a.key"), col("b.key"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("d"))
      .where(col("d") <= maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("hand trace: distances, clone groups, and the short-string pair " +
      "the q-gram filter alone would miss") {
    val rows = Seq(
      1L -> "goldenrod lavender spring",   // long path
      2L -> "goldenrod lavender sprint",   // dist 1 from 1
      3L -> "goldenrod lavander sprint",   // dist 1 from 2, dist 2 from 1
      4L -> "completely different words",  // far from everything
      5L -> "abcd",                        // short: "abcd" vs "axcd" share
      6L -> "axcd",                        //   NO 3-gram — deletion path
      7L -> "goldenrod lavender spring")   // exact clone of 1 → dist 0
    val got = run(rows)
    assert(got == brute(rows), s"got ${got.toList.sorted}")
    // the pairs the trace pins explicitly
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((1L, 3L, 2L)))
    assert(got.contains((5L, 6L, 1L)))
    assert(got.contains((1L, 7L, 0L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("boundary lengths: pairs straddling the short/long cutoff") {
    // longMin = 9, shortMax = 10 for k=2, q=3: lengths 8..11 exercise
    // every routing combination, including the 8↔10 short-short and
    // 9↔11 long-long straddles
    val names = Seq("abcdefgh", "abcdefghi", "abcdefghij", "abcdefghijk",
      "abcdefxh", "abxdefghix", "zbcdefghijk")
    val rows = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
    assert(run(rows) == brute(rows))
  }

  test("random corpora over a tiny alphabet equal brute force " +
      "(dense near-pairs, mixed lengths)") {
    val nameG = for {
      n  <- Gen.chooseNum(1, 16)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val names = samples(nameG, 80)
    val rows = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
    val got = run(rows)
    val want = brute(rows)
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("unicode names: codepoint-level grams and distances") {
    val rows = Seq(
      1L -> "中文字符串的测试案例",
      2L -> "中文字符串的测试案别",   // 1 substitution
      3L -> "中文字符串测试案例",     // 1 deletion vs 1
      4L -> "中文字", 5L -> "中英字") // short path, 1 substitution
    assert(run(rows) == brute(rows))
  }

  test("fuzzy clusters: transitive closure of the pair relation, " +
      "smallest key as the cluster id") {
    val rows = Seq(
      1L -> "goldenrod lavender spring",
      2L -> "goldenrod lavender sprint",   // chains to 1
      3L -> "goldenrod lavander sprint",   // chains to 2 (and 1 at d2)
      4L -> "completely different words",  // singleton
      5L -> "abcd", 6L -> "axcd",          // short-path pair
      7L -> "goldenrod lavender spring")   // clone of 1
    val got = FuzzyJoin.fuzzyClustersOn(rows.toDF("key", "name"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.Caches.releaseAll()
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 1L), s"got $got")
  }

  test("fuzzy clusters equal union-find over brute-force pairs on " +
      "random corpora") {
    val nameG = for {
      n  <- Gen.chooseNum(1, 16)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val names = samples(nameG, 60)
    val rows = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
    val got = FuzzyJoin.fuzzyClustersOn(rows.toDF("key", "name"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.Caches.releaseAll()
    // reference: union-by-min over the brute-force pair set
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    brute(rows).foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = rows.map(r => r._1 -> find(r._1)).toMap
    assert(got == want,
      s"diff=${got.toSet.diff(want.toSet).take(5)}")
  }

  test("pair-mass guard: clone-heavy input trips the cap loudly, " +
    "naming the cluster form; under the cap the answer is unchanged") {
    // 40 keys sharing one name -> C(40,2) = 780 distance-0 pairs
    val rows = (0L until 40L).map(k => (k, "same-name"))
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyPairsOn(rows.toDF("key", "name"), maxDist = 2,
        maxPairs = 100L).collect()
    }
    graft.Caches.releaseAll()
    assert(e.getMessage.contains("fuzzyClusters"), e.getMessage)
    assert(e.getMessage.contains("780"), e.getMessage)
    // the same corpus below the cap: exactly the brute-force answer
    assert(run(rows) == brute(rows))
  }

  test("maxDist=1 tightens the answer and the distances are exact") {
    val rows = Seq(1L -> "goldenrod lavender spring",
      2L -> "goldenrod lavender sprint",
      3L -> "goldenrod lavander sprint")
    val got = run(rows, maxDist = 1)
    assert(got == brute(rows, maxDist = 1))
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L)))
  }
}
