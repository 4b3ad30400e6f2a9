package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.TextFunctions.md5LongScala

/** Hand-traced correctness authority for the three round-8 additions
  * (q87 LM perplexity, q88 TF-IDF keywords, q89 mixture epochs) — the
  * same contract BpeSpec provides for BPE: tiny literal corpora whose
  * expected outputs are computed by hand in the comments, so a change
  * in semantics fails here even if the DuckDB oracle drifts with it. */
class LangModelMixSpec extends SparkSpec {
  import spark.implicits._

  /** Write a tiny documents table (full driver schema not needed — the
    * operators only touch the columns they select). */
  private def docsDir(rows: Seq[(String, String, String, String)]): String = {
    val dir = Files.createTempDirectory("lmx").toString
    rows.toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("perplexityScore hand-trace: smoothed inverse-prob micros") {
    // Train slice (lang=en): d1 "a b a b", d2 "a b c", d4 "a".
    //   uni: a=4, b=3, c=1  → V=3
    //   bi:  (a,b)=3, (b,a)=1, (b,c)=1
    // Scored docs (all langs, ≥2 tokens): d1, d2, d3 "a b q b".
    //   ip(w1,w2) = ((c1(w1)+V)*1e6) div (c2+1)
    //   ip(a,b) = (4+3)e6 div 4 = 1_750_000
    //   ip(b,a) = (3+3)e6 div 2 = 3_000_000
    //   ip(b,c) = (3+3)e6 div 2 = 3_000_000
    //   ip(b,q) = (3+3)e6 div 1 = 6_000_000   (unseen bigram)
    //   ip(q,b) = (0+3)e6 div 1 = 3_000_000   (unseen w1 → c1=0)
    // d1: (2*1_750_000 + 3_000_000) div 3 = 2_166_666, n=3
    // d2: (1_750_000 + 3_000_000) div 2   = 2_375_000, n=2
    // d3: (1_750_000 + 6_000_000 + 3_000_000) div 3 = 3_583_333, n=3
    // d4: one token → no bigrams → absent.
    val dir = docsDir(Seq(
      ("d1", "en", "s", "a b a b"),
      ("d2", "en", "s", "a b c"),
      ("d3", "xx", "s", "a b q b"),
      ("d4", "en", "s", "a")))
    val got = LangModel.perplexityScore(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("d1", 3L, 2166666L),
      ("d2", 2L, 2375000L),
      ("d3", 3L, 3583333L)))
  }

  test("map-side scorer under trainModel matches the join-based q87 plan") {
    // the streaming gate's broadcast-model expression must agree
    // BIT-FOR-BIT with the batch join plan on a real corpus: same
    // integer formula, per-position sum == per-distinct-bigram ip·tf
    val model = LangModel.trainModel(spark, sf)
    val mapSide = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        LangModel.scoreColumn(model,
          org.apache.spark.sql.functions.col("text")).as("ppx_micros"))
      .where(org.apache.spark.sql.functions.col("ppx_micros").isNotNull)
      .as[(String, Long)].collect().toMap
    val joined = LangModel.perplexityScore(spark, sf)
      .select("doc_id", "ppx_micros")
      .as[(String, Long)].collect().toMap
    assert(mapSide.nonEmpty && mapSide == joined,
      s"map-side scorer diverged from the join plan " +
        s"(${mapSide.size} vs ${joined.size} rows)")
  }

  test("oddsQuality hand-trace: clamped rate-ratio weights, occurrence-" +
      "weighted integer mean") {
    // Corpus: d1 (en) "a a b", d2 (fr) "a c".
    //   model: a cp=2 cn=1; b cp=1 cn=0; c cp=0 cn=1; np=3 nn=2 V=3
    //   rates (per 1e9, add-one): rp = (cp+1)e9 // 6, rn = (cn+1)e9 // 5
    //   a: rp 5e8,        rn 4e8 → w = 5e8·1e6 // 4e8  = 1_250_000
    //   b: rp 333333333,  rn 2e8 → w = 1_666_666
    //   c: rp 166666666,  rn 4e8 → w =   416_666
    // d1: (2·1_250_000 + 1_666_666) div 3 = 1_388_888 → pred 1
    // d2: (1_250_000 + 416_666) div 2     =   833_333 → pred 0
    val dir = docsDir(Seq(
      ("d1", "en", "s", "a a b"),
      ("d2", "fr", "s", "a c")))
    val got = LangModel.oddsQuality(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    graft.Caches.releaseAll()
    assert(got == Seq(
      ("d1", 3L, 1388888L, 1L),
      ("d2", 2L, 833333L, 0L)))
  }

  test("map-side odds scorer under trainOdds matches the q103 join plan") {
    // the streaming gate's in-expression weight table must reproduce
    // the batch join bit-for-bit on a corpus the model has fully seen
    val model = LangModel.trainOdds(spark, sf)
    val mapSide = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        LangModel.oddsScoreColumn(model,
          org.apache.spark.sql.functions.col("text")).as("s"))
      .where(org.apache.spark.sql.functions.col("s").isNotNull)
      .as[(Long, Long)].collect().toMap
    val joined = LangModel.oddsQuality(spark, sf)
      .select("doc_id", "score_micros")
      .as[(Long, Long)].collect().toMap
    graft.Caches.releaseAll()
    assert(mapSide.nonEmpty && mapSide == joined,
      s"map-side odds scorer diverged from the join plan " +
        s"(${mapSide.size} vs ${joined.size} rows)")
  }

  test("lmLangId hand-trace: least-perplexed model wins") {
    // Corpus: en={d1,d2: "a b"}, fr={d3,d4: "x y"}, xx={d5: "a b"}.
    // Models — en: uni a=2,b=2, V=2, bi(a,b)=2; fr: x=2,y=2, V=2,
    // bi(x,y)=2; xx: a=1,b=1, V=2, bi(a,b)=1.
    // Score "a b": en (2+2)e6 div 3 = 1_333_333; fr (0+2)e6 div 1 =
    // 2_000_000; xx (1+2)e6 div 2 = 1_500_000 → en wins — INCLUDING
    // for d5, whose stored lang is xx: the bigger training mass makes
    // the en model less perplexed, which is the point of LM-based ID.
    // "x y" symmetrically → fr at 1_333_333.
    val dir = docsDir(Seq(
      ("d1", "en", "s", "a b"), ("d2", "en", "s", "a b"),
      ("d3", "fr", "s", "x y"), ("d4", "fr", "s", "x y"),
      ("d5", "xx", "s", "a b")))
    val got = LangModel.lmLangId(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("d1", "en", 1333333L), ("d2", "en", 1333333L),
      ("d3", "fr", 1333333L), ("d4", "fr", 1333333L),
      ("d5", "en", 1333333L)))
  }

  test("lmLangId hit/miss decomposition == the naive ×L product") {
    // the sf corpus: the inner-join + closed-form-miss assembly must
    // reproduce the full cross-every-language product bit-for-bit
    val full = LangModel.lmLangIdProduct(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    val dec = LangModel.lmLangId(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(dec.nonEmpty && dec == full)
    // zero-hit corner: d1 "a b" has unigram hits ONLY in its own lang
    // xx (ppx (1+2)e6 div 2 = 1.5e6), but the one-word-vocab lang zz
    // wins with ZERO hits at exactly v·1e6 = 1e6 — the pure
    // closed-form-miss row the decomposition never joins for. d2
    // "k k k": zz's own model gives (3+1)e6 div (2+1) = 1_333_333
    // (beats xx's zero-hit 2e6).
    val dir = docsDir(Seq(
      ("d1", "xx", "s", "a b"), ("d2", "zz", "s", "k k k")))
    val got = LangModel.lmLangId(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("d1", "zz", 1000000L), ("d2", "zz", 1333333L)),
      got.toString)
    val gotFull = LangModel.lmLangIdProduct(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(gotFull == got, s"$gotFull vs $got")
  }

  test("cross-corpus scoring: join variant == map-side model, " +
      "separate reference") {
    // the production shape — train on one corpus, score another — must
    // agree between the join plan (perplexityScoreAgainst) and the
    // broadcast-model expression (trainModel + scoreColumn)
    import org.apache.spark.sql.functions.{col => c}
    val refDir = docsDir(Seq(
      ("r1", "en", "s", "a b a b"), ("r2", "en", "s", "a b c")))
    val corpusDir = docsDir(Seq(
      ("d1", "xx", "s", "a b q b"), ("d2", "xx", "s", "c a"),
      ("d3", "xx", "s", "solo")))
    val joined = LangModel.perplexityScoreAgainst(
        graft.Tables.documents(spark, corpusDir),
        graft.Tables.documents(spark, refDir))
      .as[(String, Long, Long)].collect().toSeq
    val model = LangModel.trainModel(spark, refDir)
    val mapSide = graft.Tables.documents(spark, corpusDir)
      .select(c("doc_id"),
        LangModel.scoreColumn(model, c("text")).as("p"))
      .where(c("p").isNotNull)
      .orderBy("doc_id")
      .as[(String, Long)].collect().toSeq
    assert(joined.map(r => (r._1, r._3)) == mapSide)
    assert(joined.map(_._1) == Seq("d1", "d2"), "1-token doc must be absent")
  }

  test("tfidfKeywords hand-trace: integer idf, score-desc/token-asc ties") {
    // d1 "x x y", d2 "x z", d3 "y y y z w"; N=3.
    //   df: x=2, y=2, z=2, w=1 → idf6: 1_500_000 each, w 3_000_000
    // d1: x 2*1.5e6=3_000_000 rk1; y 1_500_000 rk2
    // d2: x and z tie at 1_500_000 → token asc: x rk1, z rk2
    // d3: y 4_500_000 rk1; w 3_000_000 rk2; z 1_500_000 rk3
    val dir = docsDir(Seq(
      ("d1", "en", "s", "x x y"),
      ("d2", "en", "s", "x z"),
      ("d3", "en", "s", "y y y z w")))
    val got = TextAnalysis.tfidfKeywords(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("d1", "x", 3000000L, 1L), ("d1", "y", 1500000L, 2L),
      ("d2", "x", 1500000L, 1L), ("d2", "z", 1500000L, 2L),
      ("d3", "y", 4500000L, 1L), ("d3", "w", 3000000L, 2L),
      ("d3", "z", 1500000L, 3L)))
  }

  test("blocklistScan hand-trace: hit counts and the C4 keep flag") {
    // terms {slow, merge, zzz}: d1 has two hits → dropped under the
    // any-hit policy; d2 clean; d3 empty (0 tokens, trivially clean)
    val dir = docsDir(Seq(
      ("d1", "en", "s", "slow merge fast"),
      ("d2", "en", "s", "fast ok"),
      ("d3", "en", "s", "")))
    val got = TextAnalysis
      .blocklistScan(spark, dir, terms = Seq("slow", "merge", "zzz"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("d1", 3L, 2L, 0L), ("d2", 2L, 0L, 1L), ("d3", 0L, 0L, 1L)))
  }

  test("tokenizerFertility hand-trace: per-lang micros under FixedMerges") {
    // Under Bpe.FixedMerges (see BpeSpec): join→1 subtoken, row→1,
    // hash→3, slow→3, order→5.
    // en: "join row" (2w, 2sub) + "hash" (1w, 3sub) → 5e6 div 3
    // xx: "slow order" (2w, 3+5 sub)               → 8e6 div 2
    val dir = docsDir(Seq(
      ("d1", "en", "s", "join row"),
      ("d2", "en", "s", "hash"),
      ("d3", "xx", "s", "slow order")))
    val got = TextAnalysis.tokenizerFertility(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("en", 3L, 5L, 1666666L),
      ("xx", 2L, 8L, 4000000L)))
  }

  test("mixtureEpochs: exact epochs when factors are integral") {
    // A=4 docs, B=2, C=1 → maxCnt=4; factors 1, 2, 4 exactly (rem=0,
    // so no stochastic top-up anywhere): every A doc appears once
    // (epoch 0), B docs twice (0,1), the C doc four times (0..3).
    val dir = docsDir(Seq(
      ("a1", "en", "A", "t"), ("a2", "en", "A", "t"),
      ("a3", "en", "A", "t"), ("a4", "en", "A", "t"),
      ("b1", "en", "B", "t"), ("b2", "en", "B", "t"),
      ("c1", "en", "C", "t")))
    val got = Sampling.mixtureEpochs(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("a1", "A", 0L), ("a2", "A", 0L), ("a3", "A", 0L), ("a4", "A", 0L),
      ("b1", "B", 0L), ("b2", "B", 0L), ("b1", "B", 1L), ("b2", "B", 1L),
      ("c1", "C", 0L), ("c1", "C", 1L), ("c1", "C", 2L), ("c1", "C", 3L)
    ).sortBy(r => (r._1, r._3)))
  }

  test("mixtureEpochs: fractional factor tops up by the salted residue") {
    // A=3, B=2 → maxCnt=3; B factor6 = 1_500_000 → 1 epoch + one extra
    // iff md5Long("mix:" + doc_id) % 1e6 < 500_000 — reproduced here
    // with the Scala twin of the expression, so the expected rep count
    // per B doc is computed independently of the operator.
    val dir = docsDir(Seq(
      ("a1", "en", "A", "t"), ("a2", "en", "A", "t"), ("a3", "en", "A", "t"),
      ("b1", "en", "B", "t"), ("b2", "en", "B", "t")))
    val reps = Sampling.mixtureEpochs(spark, dir)
      .as[(String, String, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def expectedB(id: String): Long =
      1L + (if (math.floorMod(md5LongScala(s"mix:$id"), 1000000L) < 500000L) 1L else 0L)
    assert(reps("a1") == 1L && reps("a2") == 1L && reps("a3") == 1L)
    assert(reps("b1") == expectedB("b1"))
    assert(reps("b2") == expectedB("b2"))
    // epochs are contiguous from 0 (a repeated doc's epochs are 0..r-1)
    val byDoc = Sampling.mixtureEpochs(spark, dir)
      .as[(String, String, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    byDoc.foreach { case (id, es) =>
      assert(es == (0L until es.size.toLong), s"$id epochs not contiguous: $es")
    }
  }
}
