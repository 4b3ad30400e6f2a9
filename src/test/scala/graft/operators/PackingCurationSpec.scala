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
}
