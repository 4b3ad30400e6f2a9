package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** PMI collocation mining (q127) and cross-relation fuzzy entity
  * linking (q128): hand traces with exact fixed-point values, and
  * brute-force parity on random corpora. */
class CollocationLinkSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // ---------------- q127: PMI collocations -------------------------

  private def pmi(texts: Seq[String], minCount: Long = 1L,
      topK: Int = 1000): Seq[(String, String, Long, Long)] = {
    val out = TextAnalysis
      .pmiCollocationsOn(texts.toDF("text"), minCount, topK)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    graft.Caches.releaseAll()
    out
  }

  /** Brute reference via a DIFFERENT bigram formulation: per-doc lead()
    * window over posexploded tokens, then plain Scala fixed-point
    * arithmetic on the driver (BigInt — no 128-bit subtleties). */
  private def brutePmi(texts: Seq[String], minCount: Long = 1L,
      topK: Int = 1000): Seq[(String, String, Long, Long)] = {
    val toksPerDoc = texts.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = toksPerDoc.flatten.groupBy(identity).map { case (w, xs) =>
      w -> xs.size.toLong }
    val t = toksPerDoc.map(_.size.toLong).sum
    val bigs = toksPerDoc.flatMap(l => l.zip(l.drop(1)))
    val bt = bigs.size.toLong
    val bcnt = bigs.groupBy(identity).map { case (ab, xs) =>
      ab -> xs.size.toLong }
    bcnt.toSeq.collect { case ((a, b), nab) if nab >= minCount =>
      val lift = (BigInt(nab) * t * t * 1000000) /
        (BigInt(uni(a)) * uni(b) * bt)
      (a, b, nab, lift.toLong)
    }.sortBy { case (a, b, _, l) => (-l, a, b) }.take(topK)
  }

  test("hand trace: exact fixed-point lifts and the tie broken by (a,b)") {
    // uni: a:3 b:3 c:1, T=7; bigrams: (a,b):3 (b,a):1 (b,c):1, B=5
    // lift(a,b) = 3*49e6/45 = 3266666 = lift(b,c) = 49e6/15 — a tie the
    // (a, b) order must break deterministically
    val got = pmi(Seq("a b a b", "a b c"))
    assert(got == Seq(
      ("a", "b", 3L, 3266666L),
      ("b", "c", 1L, 3266666L),
      ("b", "a", 1L, 1088888L)), s"got $got")
  }

  test("minCount gates rare bigrams before ranking; topK truncates") {
    val texts = Seq("a b a b", "a b c")
    assert(pmi(texts, minCount = 2L).map(x => (x._1, x._2)) ==
      Seq(("a", "b")))
    assert(pmi(texts, topK = 1).size == 1)
  }

  test("random corpora equal the lead()-formulated brute force " +
      "(dense ties, single-token and empty docs)") {
    val docG = for {
      n  <- Gen.chooseNum(0, 12)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield ws.mkString(" ")
    val texts = samples(docG, 60)
    assert(pmi(texts) == brutePmi(texts))
  }

  // ---------------- q128: fuzzy entity linking ---------------------

  private def link(mentions: Seq[(String, Long)], dims: Seq[String],
      maxDist: Int = 2): Seq[(String, String, Long, Long)] = {
    val out = FuzzyJoin
      .fuzzyLinkOn(mentions.toDF("mention", "n_occ"),
        dims.toDF("name"), maxDist)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    graft.Caches.releaseAll()
    out
  }

  /** Plain full-matrix Levenshtein — independent of both the operator's
    * banded kernel and Spark's builtin. */
  private def lev(a: String, b: String): Long = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length).toLong
  }

  /** Brute reference: full cross product through an independent
    * levenshtein, argmin by (dist, name) per mention. */
  private def bruteLink(mentions: Seq[(String, Long)], dims: Seq[String],
      maxDist: Int = 2): Seq[(String, String, Long, Long)] = {
    val dn = dims.distinct
    mentions.flatMap { case (m, occ) =>
      val cands = dn.map(d => (d, lev(m, d)))
        .filter(_._2 <= maxDist)
      if (cands.isEmpty) Nil
      else {
        val (d, dist) = cands.minBy { case (n, dd) => (dd, n) }
        Seq((m, d, dist, occ))
      }
    }.sortBy(_._1)
  }

  test("hand trace: exact hit, tie-break to the smaller name, " +
      "unresolved mention absent") {
    val mentions = Seq(
      ("small ring", 7L),   // exact catalog member → dist 0
      ("small rink", 2L),   // dist 1 of BOTH "small ring" and "small rind"
      ("small xyzw", 3L),   // dist 1 of BOTH "small xyzz" and "small xyzy"
      ("totally unrelated", 9L)) // resolves nowhere
    val dims = Seq("small ring", "small rind", "small xyzz", "small xyzy")
    val got = link(mentions, dims)
    assert(got == Seq(
      ("small ring", "small ring", 0L, 7L),
      // both ties resolve to the lexicographically smaller name
      ("small rink", "small rind", 1L, 2L),
      ("small xyzw", "small xyzy", 1L, 3L)), s"got $got")
  }

  test("boundary lengths: probe/dim pairs straddling the short/long " +
      "cutoff (longMin=9, shortMax=10 at k=2)") {
    val mentions = Seq("abcdefgh", "abcdefghi", "abcdefghij",
      "abcdefghijk", "abcdefxh").zipWithIndex
      .map { case (m, i) => (m, i.toLong + 1) }
    val dims = Seq("abcdefgha", "abxdefghix", "zbcdefghijk", "abcdefgh")
    assert(link(mentions, dims) == bruteLink(mentions, dims))
  }

  test("random corpora over a tiny alphabet equal brute force " +
      "(both paths, exact members, dense near-misses)") {
    val nameG = for {
      n  <- Gen.chooseNum(1, 14)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val ms = samples(nameG, 50).distinct.zipWithIndex
      .map { case (m, i) => (m, i.toLong + 1) }
    val ds = samples(nameG, 30).map(_.reverse)
    val got = link(ms, ds)
    val want = bruteLink(ms, ds)
    assert(got == want,
      s"missing=${(want.toSet -- got).take(5)} extra=${(got.toSet -- want).take(5)}")
  }

  test("maxDist=1 tightens the resolution") {
    val ms = Seq(("abcd", 1L), ("abxy", 2L))
    val ds = Seq("abcz", "abce")
    // "abcd"→dist 1 of both, tie → "abce"; "abxy" is dist 2 → dropped
    assert(link(ms, ds, maxDist = 1) == Seq(("abcd", "abce", 1L, 1L)))
  }
}
