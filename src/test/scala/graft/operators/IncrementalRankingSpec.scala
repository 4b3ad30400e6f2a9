package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the round-7 additions: incremental (corpus-vs-batch)
  * dedup, cross-doc duplicate spans, temperature mixture sampling, and
  * BM25 relevance ranking.
  */
class IncrementalRankingSpec extends SparkSpec {
  import spark.implicits._

  // —— incremental dedup (q66) ——

  test("newDocsAgainst keeps exactly the batch rows absent from the corpus") {
    val corpus = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "delta epsilon", "en"),
      (3L, "unrelated corpus text", "de"))
      .toDF("doc_id", "text", "lang")
    val incoming = Seq(
      (10L, "alpha beta gamma", "en"),      // exact dup of 1
      (11L, "  ALPHA   beta GAMMA ", "en"), // canonical-form dup of 1
      (12L, "brand new document", "en"),    // new
      (13L, "delta epsilon", "fr"),         // dup of 2 (lang ignored)
      (14L, "another new one", "zh"))       // new
      .toDF("doc_id", "text", "lang")
    val got = Dedup.newDocsAgainst(corpus, incoming)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(12L, 14L))
  }

  test("newDocsAgainst is exact under heavy Bloom false positives") {
    // an undersized, high-fpp Bloom marks nearly every batch row as a
    // candidate dup — the exact confirm join must still produce the
    // plain anti-join answer (the Bloom is an optimization, never the
    // decision)
    val corpus = (0L until 50L).map(i => (i, s"corpus doc number $i", "en"))
      .toDF("doc_id", "text", "lang")
    val incoming = (0L until 50L).map { i =>
      if (i % 2 == 0) (100 + i, s"corpus doc number $i", "en") // dup
      else (100 + i, s"fresh batch doc $i", "en")              // new
    }.toDF("doc_id", "text", "lang")
    val got = Dedup.newDocsAgainst(corpus, incoming,
      expectedCorpusDocs = 2, fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val want = (0L until 50L).filter(_ % 2 == 1).map(100 + _).toSet
    assert(got == want)
  }

  test("newDocsAgainst never shuffles the corpus side") {
    // the scale contract: the 100 TB corpus is read (Bloom pass + semi
    // probe) but NEVER exchanged — the only shuffle in the final plan is
    // the batch-side candidate-fingerprint distinct, and nothing wide
    // rides it
    val corpus = (0L until 200L).map(i => (i, s"corpus text $i", "en"))
      .toDF("doc_id", "text", "lang")
    val incoming = (0L until 20L)
      .map(i => (1000 + i, s"batch text ${i % 10}", "en"))
      .toDF("doc_id", "text", "lang")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Dedup.newDocsAgainst(corpus, incoming)
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size <= 1,
        s"corpus-side shuffle crept in: ${exchanges.map(_.output.map(_.name))}")
      exchanges.foreach(e => assert(!e.output.exists(_.name == "text")))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  // —— duplicate spans (q69) ——

  test("duplicateSpans merges adjacent shared k-grams into maximal spans") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10 shared tokens
    val docs = Seq(
      (1L, s"one two three four five six seven eight $shared x y z"),
      (2L, s"$shared totally different trailing tokens here now ok"),
      (3L, "short doc")) // < k tokens → contributes nothing
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpansOn(docs, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // doc 1: shared run is tokens 8..17 → grams at pos 8,9,10 (3 grams),
    // span covers tokens 8..17; doc 2: grams at 0,1,2, span 0..9
    assert(got == Seq((1L, 8L, 17L, 3L), (2L, 0L, 9L, 3L)))
  }

  test("duplicateSpans ignores within-doc-only repetition") {
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run filler filler filler filler filler filler filler $run"),
      (2L, "nothing in common with the first document at all right"))
      .toDF("doc_id", "text")
    // the 8-gram run repeats only inside doc 1 → min(doc_id)=max(doc_id)
    // → no spans (within-doc repetition is q57's job)
    assert(Dedup.duplicateSpansOn(docs, k = 8).count() == 0)
  }

  test("duplicateSpans reports disjoint shared runs as separate spans") {
    val runA = (1 to 8).map(i => s"a$i").mkString(" ")
    val runB = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$runA gap1 gap2 gap3 $runB"),
      (2L, s"$runA completely other middle section words $runB"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpansOn(docs, k = 8)
      .where(col("doc_id") === 1L)
      .select("span_start", "span_end")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1: runA at tokens 0..7, runB at tokens 11..18 — two islands
    assert(spans == Seq((0L, 7L), (11L, 18L)))
  }

  test("duplicateSpanStats counts overlapping spans' tokens once") {
    // doc 1 shares grams at positions 0 and 3 (via docs 2 and 3): spans
    // [0,7] and [3,10] overlap in token space — distinct coverage is all
    // 11 tokens (sum-of-lengths would claim 16, fraction > 1)
    val ws = (0 to 10).map(i => s"w$i")
    val docs = Seq(
      (1L, ws.mkString(" ")),
      (2L, ws.slice(0, 8).mkString(" ")),
      (3L, ws.slice(3, 11).mkString(" ")),
      (4L, "entirely unrelated text with no shared runs at all"))
    val dir = java.nio.file.Files.createTempDirectory("spanstats").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Dedup.duplicateSpanStats(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq((1L, 11L, 11L, 1.0), (2L, 8L, 8L, 1.0),
      (3L, 8L, 8L, 1.0), (4L, 9L, 0L, 0.0)))
  }

  // —— temperature mixture sampling (q67) ——

  test("temperature sample matches its per-stratum threshold definition") {
    import graft.functions.TextFunctions.md5Long
    val docs = graft.Tables.documents(spark, sf)
    val got = Sampling.temperatureSample(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    // independent formulation: window count instead of broadcast join
    val cnt = count(lit(1))
      .over(org.apache.spark.sql.expressions.Window.partitionBy("lang"))
    val want = docs
      .withColumn("thr", floor(lit(1000000.0) * 4 /
        sqrt(cnt.cast("double"))).cast("long"))
      .where(md5Long(concat(lit("tmix:"), col("doc_id").cast("string")))
        % 1000000 < col("thr"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("temperature sample downsamples majority strata harder") {
    val docs = graft.Tables.documents(spark, sf)
    val total = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.temperatureSample(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // keep RATE is min(1, 4/√count): strictly non-increasing in stratum
    // size, so compare the largest vs smallest stratum's realized rates
    val biggest = total.maxBy(_._2)._1
    val smallest = total.minBy(_._2)._1
    if (total(biggest) > 4 * total(smallest)) {
      val rBig = kept.getOrElse(biggest, 0L).toDouble / total(biggest)
      val rSmall = kept.getOrElse(smallest, 0L).toDouble / total(smallest)
      assert(rBig < rSmall,
        s"majority '$biggest' rate $rBig should be below " +
          s"minority '$smallest' rate $rSmall")
    }
  }

  // —— BM25 ranking (q68) ——

  test("bm25 ranks higher tf above lower tf at equal length") {
    val docs = Seq(
      (1L, "spark spark filler filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "filler filler filler filler filler"))
      .toDF("doc_id", "text")
    val got = Ranking.bm25RankOn(docs, Seq("spark"))
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L)) // doc 3 has no term → excluded
  }

  test("bm25 length normalization: same tf, shorter doc wins") {
    val docs = Seq(
      (1L, "spark a b c"),
      (2L, "spark a b c d e f g h i j k l m n o p q r s t u v w"),
      (3L, "padding text so the corpus has a non-trivial avgdl"))
      .toDF("doc_id", "text")
    val got = Ranking.bm25RankOn(docs, Seq("spark"))
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("bm25 idf: the rarer of two terms dominates at equal tf") {
    // 'rare' appears in 1 of 10 docs, 'common' in 9 of 10; the probe
    // docs match exactly one term each with identical tf and dl
    val background = (10L until 18L).map(i => (i, "common w x y z"))
    val docs = (Seq(
      (1L, "rare a b c d"),
      (2L, "common a b c d")) ++ background)
      .toDF("doc_id", "text")
    val scores = Ranking.bm25RankOn(docs, Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
  }

  // —— hybrid RRF fusion (q114) ——

  test("rrfFuse: refuses an input with no proven row bound (corpus relation)") {
    val corpus = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), lit(1.0).as("score"))
    val bounded = corpus.limit(5)
    val e = intercept[IllegalArgumentException] {
      Ranking.rrfFuse(corpus, bounded)
    }
    assert(e.getMessage.contains("k-bounded") ||
      e.getMessage.contains("row bound"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Ranking.rrfFuse(bounded, corpus)
    }
    assert(e2.getMessage.contains("vec"), e2.getMessage)
    // limit()-bounded relations (even projected/renamed) still pass
    assert(Ranking.rrfFuse(
      bounded, bounded.withColumnRenamed("score", "s")
        .withColumnRenamed("s", "score")).count() > 0)
  }

  test("rrfFuse: hand-traced ranks, contributions and tie-break") {
    // lex list: 10 (rank 1), 20 (rank 2); vec list: 20 (rank 1), 30 (rank 2)
    val lex = Seq((10L, 5.0), (20L, 3.0)).toDF("doc_id", "score")
    val vec = Seq((20L, 0.9), (30L, 0.5)).toDF("doc_id", "score")
    val got = Ranking.rrfFuse(lex, vec, rrfK = 60, topN = 10)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getDouble(3)))
      .toSeq
    def rrf(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got == Seq(
      (20L, Some(2L), Some(1L), rrf(1.0 / 62 + 1.0 / 61)), // both lists win
      (10L, Some(1L), None, rrf(1.0 / 61)),
      (30L, None, Some(2L), rrf(1.0 / 62))))
  }

  test("rrfFuse: equal rrf ties break on doc_id; topN cuts") {
    // two docs each rank 1 in exactly one list → identical rrf
    val lex = Seq((7L, 1.0)).toDF("doc_id", "score")
    val vec = Seq((3L, 1.0)).toDF("doc_id", "score")
    val got = Ranking.rrfFuse(lex, vec, rrfK = 60, topN = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("rrfFuse: list ranks come from rounded (score desc, id) order") {
    // equal scores within a list rank by doc_id ascending
    val lex = Seq((5L, 2.0), (1L, 2.0), (9L, 1.0)).toDF("doc_id", "score")
    val vec = Seq.empty[(Long, Double)].toDF("doc_id", "score")
    val got = Ranking.rrfFuse(lex, vec, rrfK = 60, topN = 10)
      .select("doc_id", "lex_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 5L -> 2L, 9L -> 3L))
  }

  test("hybridRrf runs end-to-end on the test tables") {
    val got = Ranking.hybridRrf(spark, sf, topN = 20).collect()
    assert(got.nonEmpty && got.length <= 20)
    val rrfs = got.map(_.getDouble(3)).toSeq
    assert(rrfs == rrfs.sorted(Ordering[Double].reverse))
  }
}
