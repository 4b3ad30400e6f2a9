package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing (q59) and near-dup canonical selection (q60). */
class PackingCurationSpec extends SparkSpec {

  test("pack: every doc packed once, offsets contiguous per block") {
    val docs = graft.Tables.documents(spark, sf)
    val packed = Packing.pack(spark, sf, budget = 256, blocks = 4)
    assert(packed.count() == docs.count(), "every doc gets a slot")
    assert(packed.select("doc_id").distinct().count() == docs.count())
    val rows = packed.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // within a block, ordered by doc_id, start_tok is the running prefix
    rows.groupBy(_._2).foreach { case (_, rs) =>
      var expect = 0L
      rs.sortBy(_._1).foreach { case (_, _, n, start, _) =>
        assert(start == expect, "offsets must be gapless per block")
        expect += n
      }
    }
    // bin encodes (block, window index of the doc's FIRST token)
    rows.foreach { case (_, block, _, start, bin) =>
      assert(bin == block * Packing.BinStride + start / 256)
    }
  }

  test("pack: bins are dense token windows, not per-doc slots") {
    val packed = Packing.pack(spark, sf, budget = 256, blocks = 4)
    val perBin = packed.groupBy("bin").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("toks")).collect()
    // packing must place multiple docs per window somewhere (the corpus
    // averages far fewer than 256 tokens per doc)
    assert(perBin.exists(_.getLong(1) > 1), "no bin packed >1 doc")
  }

  test("packSpans: spans tile every doc exactly; bins never exceed budget") {
    val budget = 64
    val spans = Packing.packSpans(spark, sf, budget = budget, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val toks = TextAnalysis.tokenCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // per doc: spans are contiguous, start at 0, end at n_tokens
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0, s"doc $id first span must start at 0")
      assert(sorted.last._4 == toks(id), s"doc $id spans must cover all tokens")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3, s"doc $id spans must abut")
        case _           =>
      }
    }
    // docs with zero tokens emit no span; everything else is covered
    assert(spans.map(_._1).toSet == toks.filter(_._2 > 0).keySet)
    // no bin carries more than `budget` tokens
    val perBin = spans.groupBy(_._2).map { case (bin, ss) =>
      bin -> ss.map(s => s._4 - s._3).sum
    }
    assert(perBin.values.forall(_ <= budget),
      s"overfull bin: ${perBin.maxBy(_._2)}")
    // full bins exist (docs really straddle boundaries at this budget)
    assert(perBin.values.exists(_ == budget), "no bin was filled exactly")
  }

  test("canonicalDocs keeps exactly the best-quality member per cluster") {
    val out = Curation.canonicalDocs(spark, sf)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.length ==
      graft.Tables.documents(spark, sf).count(), "a decision for every doc")
    rows.groupBy(_._2).foreach { case (comp, members) =>
      val keepers = members.filter(_._4 == 1)
      assert(keepers.length == 1, s"component $comp must keep exactly one")
      // the keeper is max-quality, ties broken toward the lowest doc_id
      val best = members.minBy { case (id, _, q, _) => (-q, id) }
      assert(keepers.head._1 == best._1,
        s"component $comp kept ${keepers.head._1}, best is ${best._1}")
    }
    // singletons keep themselves under their own id
    val singleton = rows.groupBy(_._2).filter(_._2.length == 1)
    assert(singleton.nonEmpty)
    singleton.foreach { case (comp, Array((id, _, _, keep))) =>
      assert(comp == id && keep == 1)
    }
  }

  test("corpusReport totals reconcile with the per-doc operators") {
    val sf = "/root/testdata/sf0.001"
    val rep = Curation.corpusReport(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
    assert(rep.map(_.getLong(2)).sum == docs.count(), "n_docs covers corpus")
    assert(rep.map(_.getLong(3)).sum ==
      docs.agg(sum("n_chars")).head.getLong(0), "total_chars reconciles")
    // group keys are unique and every aggregate is non-negative/bounded
    assert(rep.map(r => (r.getString(0), r.getString(1))).distinct.length
      == rep.length)
    rep.foreach { r =>
      assert(r.getLong(5) >= 0 && r.getLong(5) < r.getLong(2),
        "exact dups below group size")
      assert(r.getLong(6) >= 0 && r.getLong(6) <= 10000,
        "mean quality in basis points")
      assert(r.getLong(7) >= 0 && r.getLong(7) <= r.getLong(2),
        "pii incidence bounded by group size")
    }
  }

  test("curriculum: deciles ~equal-mass and monotone against quality") {
    val sf = "/root/testdata/sf0.001"
    val cur = Curation.curriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(cur.map(_._3).forall(d => d >= 1 && d <= 10))
    // monotone: a strictly better quality never lands in a strictly
    // worse (higher-numbered) decile
    cur.sortBy(_._2).sliding(2).foreach {
      case Array((_, q1, d1), (_, q2, d2)) =>
        if (q1 < q2) assert(d1 >= d2, s"quality $q1<$q2 but decile $d1<$d2")
        else assert(d1 == d2, "ties share a decile")
      case _ =>
    }
    // equal-mass up to tie granularity: no decile holds more than the
    // largest quality-tie group plus a tenth of the corpus
    val biggestTie = cur.groupBy(_._2).values.map(_.length).max
    val biggest = cur.groupBy(_._3).values.map(_.length).max
    assert(biggest <= cur.length / 10 + biggestTie,
      s"decile of $biggest docs exceeds tie-adjusted tenth")
  }

  test("gopher rules: each rule trips on exactly its violation") {
    import spark.implicits._
    val fifty = (1 to 50).map(_ => "the of and word").mkString(" ")
    val docs = Seq(
      // 0: 200 tokens, wlen (3+2+3+4)/4=3.0 ok, stopwords {the,of,and},
      //    all alpha, no symbols → passes everything
      (0L, fifty),
      // 1: word count 4 < 50 → fails ONLY r_wordcount
      (1L, "the of and word"),
      // 2: mean word length 2.4 < 3 (tokens a,of,be,to,the ×40 = wlen
      //    (1+2+2+2+3)/5) → fails ONLY r_wordlen
      (2L, (1 to 40).map(_ => "a of be to the").mkString(" ")),
      // 3: 50 of its 200 tokens are '###' (symbol count 150 > 0.1·200);
      //    '###' has no letter but 150/200 alpha = 75% < 80% also trips
      //    r_alpha — craft symbols INSIDE words instead: 'w###ord' keeps
      //    alpha, adds 3 '#' per word → 150 symbols in 50 words of doc
      //    0's tail. Use fifty + 50×'w###d' = 250 tokens, 150 '#' → sym
      //    ratio 0.6 → fails ONLY r_symbol
      (3L, fifty + " " + (1 to 50).map(_ => "w###d").mkString(" ")),
      // 4: 30% pure-digit tokens → fails ONLY r_alpha (wlen: '12345'
      //    ×60 + doc-0 body stays in [3,10])
      (4L, fifty + " " + (1 to 60).map(_ => "12345").mkString(" ")),
      // 5: only one distinct stopword ('the') → fails ONLY r_stop
      (5L, (1 to 60).map(_ => "the green word").mkString(" ")),
      // 6: empty text → zero tokens, fails everything
      (6L, "")).toDF("doc_id", "text")
    val got = Curation.gopherRulesOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(got(0L) == ((1L, 1L, 1L, 1L, 1L, 1L)), s"doc0: ${got(0L)}")
    assert(got(1L) == ((0L, 1L, 1L, 1L, 1L, 0L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((1L, 0L, 1L, 1L, 1L, 0L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((1L, 1L, 0L, 1L, 1L, 0L)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((1L, 1L, 1L, 0L, 1L, 0L)), s"doc4: ${got(4L)}")
    assert(got(5L) == ((1L, 1L, 1L, 1L, 0L, 0L)), s"doc5: ${got(5L)}")
    assert(got(6L) == ((0L, 0L, 0L, 0L, 0L, 0L)), s"doc6: ${got(6L)}")
    // wlen_micros is the exact integer mean: doc 0 = 12 chars / 4 toks
    val wlen = Curation.gopherRulesOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(wlen(0L) == 3000000L, s"doc0 wlen ${wlen(0L)}")
    assert(wlen(6L) == 0L)
  }

  test("rollup report reconciles: subtotals = Σ cells, grand = corpus") {
    val rows = Curation.rollupReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val cells = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val subs = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length == 1 && cells.nonEmpty && subs.nonEmpty)
    subs.foreach { case (src, _, nd, nt) =>
      val mine = cells.filter(_._1 == src)
      assert(nd == mine.map(_._3).sum && nt == mine.map(_._4).sum,
        s"subtotal for $src does not reconcile")
    }
    assert(grand.head._3 == cells.map(_._3).sum)
    assert(grand.head._3 ==
      graft.Tables.documents(spark, sf).count())
  }

  test("gopher repetition: hand-traced char-mass micros per signal") {
    import spark.implicits._
    // doc 3: 60 DISTINCT 3-char tokens — low repetition, passes all
    val clean = (1 to 60).map(i => f"t$i%02d").mkString(" ")
    val docs = Seq(
      // 0: "ab ab ab" — total 6 chars; top-2-gram "ab ab" count 2,
      //    charlen 4 → mass 8 → 1333333 micros (trips); top3 = the one
      //    3-gram, mass 6 → 1000000; no 4-grams; no 5..10-grams
      (0L, "ab ab ab"),
      // 1: four distinct 4-char tokens — total 16; top2 mass 8 →
      //    500000, top3 mass 12 → 750000, top4 mass 16 → 1000000
      (1L, "abcd efgh ijkl mnop"),
      // 2: empty → all zeros, keep 0
      (2L, ""),
      // 3: clean — top2 6/180 → 33333, top3 50000, top4 66666, dup 0
      (3L, clean)).toDF("doc_id", "text")
    val got = Curation.gopherRepetitionOn(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          (5 to 10).map(i => r.getLong(i)).toList, r.getLong(11)))
      .toMap
    assert(got(0L) == ((6L, 1333333L, 1000000L, 0L,
      List(0L, 0L, 0L, 0L, 0L, 0L), 0L)), s"doc0: ${got(0L)}")
    assert(got(1L) == ((16L, 500000L, 750000L, 1000000L,
      List(0L, 0L, 0L, 0L, 0L, 0L), 0L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L, 0L,
      List(0L, 0L, 0L, 0L, 0L, 0L), 0L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((180L, 33333L, 50000L, 66666L,
      List(0L, 0L, 0L, 0L, 0L, 0L), 1L)), s"doc3: ${got(3L)}")
  }

  test("gopher repetition: duplicated-gram mass counts EVERY occurrence") {
    import spark.implicits._
    // "v w x y z" ×3 (15 single-char tokens, total 15): period-5
    // repetition makes EVERY 5-gram a duplicate — identity classes
    // {0,5,10} (count 3) and {1,6},{2,7},{3,8},{4,9} (count 2 each),
    // charlen 5 → dup5 mass 3·5 + 4·2·5 = 55 → 3666666 micros.
    // 6-grams: classes {i, i+5} for i = 0..4 → five identities of
    // count 2, charlen 6 → dup6 mass 60 → 4000000.
    val docs = Seq((0L, "v w x y z v w x y z v w x y z"))
      .toDF("doc_id", "text")
    val r = Curation.gopherRepetitionOn(docs).collect().head
    assert(r.getLong(1) == 15L, s"total ${r.getLong(1)}")
    assert(r.getLong(5) == 3666666L, s"dup5 ${r.getLong(5)}")
    assert(r.getLong(6) == 4000000L, s"dup6 ${r.getLong(6)}")
    assert(r.getLong(11) == 0L, "must trip the keep gate")
  }

  test("gopherRepetitionKeep (the gate form) ≡ the flags' keep, " +
      "corpus-wide") {
    val docs = graft.Tables.documents(spark, sf)
    val viaFlags = Curation.gopherRepetitionOn(docs)
      .where(col("keep") === 1L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val viaGate = docs.where(Curation.gopherRepetitionKeep(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaGate == viaFlags,
      s"gate/flags diverge: ${viaGate.diff(viaFlags)} ${viaFlags.diff(viaGate)}")
    assert(viaFlags.nonEmpty, "expected some sf docs to pass")
  }

  test("gopherKeep (the streaming gate form) ≡ the flags' keep, " +
      "corpus-wide") {
    val docs = graft.Tables.documents(spark, sf)
    val viaFlags = Curation.gopherRulesOn(docs)
      .where(col("keep") === 1L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val viaGate = docs.where(Curation.gopherKeep(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaGate == viaFlags,
      s"gate/flags diverge: ${viaGate.diff(viaFlags)} ${viaFlags.diff(viaGate)}")
    assert(viaFlags.nonEmpty, "expected some sf docs to pass the ruleset")
  }
}
