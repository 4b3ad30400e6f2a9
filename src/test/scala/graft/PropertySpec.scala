package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Generator-driven invariants over the core kernels (FIXTURES.md test
  * strategy: property tests for dedup/join invariants). Uses ScalaCheck
  * generators with fixed seeds (deterministic, no scalatestplus bridge
  * needed) and drives the SQL surface so the native expressions are
  * what's tested.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.listOfN(30, wordGen).map(_.mkString(" "))

  test("fingerprint is invariant under whitespace noise and case") {
    val rows = samples(textGen.flatMap(t =>
      Gen.chooseNum(2, 5).map(p => (t, t.replace(" ", " " * p).toUpperCase))), 25)
    val bad = rows.toDF("a", "b").select(
      graft.functions.TextFunctions.fingerprint(col("a")).as("fa"),
      graft.functions.TextFunctions.fingerprint(col("b")).as("fb"))
      .where(col("fa") =!= col("fb")).count()
    assert(bad == 0)
  }

  test("minhash signature is invariant under doc repetition (set semantics)") {
    // duplicating the token stream leaves the k=1 shingle SET unchanged
    val rows = samples(textGen, 25).map(t => (t, t + " " + t))
    val bad = rows.toDF("a", "b")
      .selectExpr("minhash_sig(a, 1, 8) AS sa", "minhash_sig(b, 1, 8) AS sb")
      .where(col("sa") =!= col("sb")).count()
    assert(bad == 0)
  }

  test("cosine similarity is symmetric; self-similarity is 1") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 10.0f))
      .suchThat(_.exists(_ != 0.0f))
    val rows = samples(Gen.zip(vecGen, vecGen), 25)
    val r = rows.toDF("a", "b").selectExpr(
      "cosine_similarity(a, b) AS ab", "cosine_similarity(b, a) AS ba",
      "cosine_similarity(a, a) AS aa").collect()
    r.foreach { row =>
      assert(java.lang.Double.compare(row.getDouble(0), row.getDouble(1)) == 0)
      assert(math.abs(row.getDouble(2) - 1.0) < 1e-9)
    }
  }

  test("int8 quantization is invariant under exact power-of-two scaling") {
    // symmetric quantization depends only on v_i / max|v|, so scaling a
    // vector by 4 (exact in float: exponent bump, mantissa untouched)
    // must not change a single quantized value
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1000, 1000).map(_ / 100.0f))
      .suchThat(_.exists(_ != 0.0f))
    val rows = samples(vecGen, 25).map(v => (v, v.map(_ * 4.0f)))
    val bad = rows.toDF("a", "b").selectExpr(
      "int8_quantize(a) AS qa", "int8_quantize(b) AS qb")
      .where(col("qa") =!= col("qb")).count()
    assert(bad == 0)
  }

  test("quantized cosine tracks true cosine within int8 resolution") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1000, 1000).map(_ / 100.0f))
      .suchThat(v => v.count(_ != 0.0f) >= 4)
    val rows = samples(Gen.zip(vecGen, vecGen), 25)
    val r = rows.toDF("a", "b").selectExpr(
      "cosine_similarity(a, b) AS exact",
      "cosine_similarity(int8_quantize(a), int8_quantize(b)) AS quant")
      .collect()
    r.foreach { row =>
      val (e, q) = (row.getDouble(0), row.getDouble(1))
      assert(math.abs(e - q) < 0.08,
        s"quantized cosine drifted: exact=$e quant=$q")
    }
  }

  test("asof join equals the naive theta-join + argmax on random data") {
    val tsGen = Gen.chooseNum(0L, 50L)
    val caseGen = Gen.zip(
      Gen.listOfN(40, Gen.zip(Gen.chooseNum(1L, 5L), tsGen)),       // left
      Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 5L), tsGen)))       // right
    samples(caseGen, 5).foreach { case (lraw, rraw) =>
      val left = lraw.zipWithIndex
        .map { case ((k, t), i) => (k, i.toLong, new java.sql.Timestamp(t * 1000)) }
        .toDF("k", "ev", "ts")
      // unique per (k, ts): the asof contract — keep max payload
      val right = rraw.groupBy(identity).keys.toSeq
        .map { case (k, t) => (k, new java.sql.Timestamp(t * 1000), k * 100 + t) }
        .toDF("k", "ts", "v")
      val naive = left.as("l").join(right.as("r"),
          col("l.k") === col("r.k") && col("l.ts") >= col("r.ts"), "left")
        .groupBy(col("l.ev").as("ev"))
        .agg(max(struct(col("r.ts"), col("r.v"))).getField("v").as("v"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val asof = graft.operators.AsofJoin
        .asof(left, right, "k", "ts", Seq("v"))
        .select("ev", "v")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(asof == naive)
    }
  }

  test("partition-scoped upsert equals an in-memory last-wins fold") {
    val dayGen = Gen.oneOf("2024-01-01", "2024-01-02", "2024-01-03")
    val rowGen = Gen.zip(Gen.chooseNum(1L, 6L), dayGen, Gen.chooseNum(0, 99))
    val epochsGen = Gen.listOfN(4, Gen.listOfN(6, rowGen)).suchThat(_.nonEmpty)
    samples(epochsGen, 3).zipWithIndex.foreach { case (epochs, ci) =>
      val out = java.nio.file.Files
        .createTempDirectory(s"upsert_prop$ci").toString + "/t"
      var expected = Map.empty[(Long, String), Int]
      epochs.zipWithIndex.foreach { case (rows, ei) =>
        // within an epoch, last occurrence of a key wins on both sides —
        // dedup the batch the way a keyed micro-batch arrives deduped
        val deduped = rows.groupBy(r => (r._1, r._2))
          .map { case (_, vs) => vs.last }.toSeq
        graft.streaming.DauStream.idempotentSinkEachBatch(
          out, Seq("user_id", "dt"))(
          deduped.toDF("user_id", "dt", "v"), ei.toLong)
        expected ++= deduped.map(r => (r._1, r._2) -> r._3)
      }
      val got = spark.read.parquet(out)
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("dt"))
          -> r.getAs[Int]("v")).toMap
      assert(got == expected, s"case $ci")
    }
  }

  test("connected components equal brute-force transitive closure") {
    val edgeGen = Gen.listOfN(25, Gen.zip(
      Gen.chooseNum(1L, 15L), Gen.chooseNum(1L, 15L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    samples(edgeGen, 5).foreach { es =>
      val edges = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("id1", "id2")
      // brute force: repeated min-label relaxation over an adjacency map
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      var comp = adj.keys.map(k => k -> k).toMap
      var changed = true
      while (changed) {
        changed = false
        adj.foreach { case (n, nbrs) =>
          val m = (nbrs.map(comp) + comp(n)).min
          if (m < comp(n)) { comp += n -> m; changed = true }
        }
      }
      // BOTH dispatch regimes must reach the same fixpoint: the driver
      // union-find (default budget) and the distributed pointer-jumping
      // loop (budget 0 forces it)
      val viaDriver = graft.operators.Dedup.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaLoop = graft.operators.Dedup
        .connectedComponents(edges, edgeBudget = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDriver == comp)
      assert(viaLoop == comp)
    }
  }

  test("connected components converge on a 100-node path in O(log n) rounds") {
    // worst-case diameter: a path graph. Plain min-label propagation needs
    // ~n rounds (would blow any sane maxIters); the pointer-jumping term
    // in each round halves the remaining label-chain, so 10 rounds must
    // suffice for n=100 (2^9 > 100)
    val n = 100L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id1", "id2")
    // edgeBudget = 0 pins the DISTRIBUTED loop (the default budget would
    // dispatch a 99-edge graph to the driver union-find)
    val got = graft.operators.Dedup
      .connectedComponents(edges, maxIters = 10, edgeBudget = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == n.toInt)
    assert(got.forall(_._2 == 1L))
  }

  test("connected components release superseded round checkpoints") {
    // Dataset.unpersist is a no-op for localCheckpoint blocks (they
    // belong to the RDD, not the CacheManager) — the builder must
    // release them via the LogicalRDD leaf or every round's label
    // snapshot stays pinned for the life of the session
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    graft.operators.Dedup
      .connectedComponents(edges, maxIters = 10, edgeBudget = 0L).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the FINAL labels checkpoint (which the result reads) may
    // remain — per-round snapshots and the edge list must be gone
    assert(after <= before + 1,
      s"superseded checkpoints still pinned: $before -> $after")
  }

  test("driver union-find path releases the edge checkpoint entirely") {
    // the driver dispatch returns a LocalRelation — NOTHING may stay
    // pinned, including the symmetrized edge list it collected from
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    val out = graft.operators.Dedup.connectedComponents(edges).collect()
    assert(out.length == 40)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"driver path leaked checkpoint blocks: $before -> $after")
  }

  test("bm25 scores equal the driver-side textbook formula on random corpora") {
    val docGen = Gen.listOfN(10, Gen.oneOf("spark", "vector", "x", "y", "z"))
      .map(_.mkString(" "))
    val corpusGen = Gen.listOfN(8, docGen)
    val terms = Seq("spark", "vector")
    val (k1, b) = (1.2, 0.75)
    samples(corpusGen, 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.Ranking
        .bm25RankOn(docs.toDF("doc_id", "text"), terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1))
      // textbook BM25, same operand order as the operator
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty) }.toMap
      val n = docs.size.toDouble
      val avgdl = toks.values.map(_.length.toLong).sum.toDouble / n
      val dfs = terms.map(t => toks.values.count(_.contains(t)).toDouble)
      val want = docs.flatMap { case (id, _) =>
        val dl = toks(id).length.toDouble
        val score = terms.zip(dfs).map { case (t, df) =>
          val tf = toks(id).count(_ == t).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
        }.sum
        // Spark's round() HALF_UPs the shortest-decimal representation —
        // BigDecimal(toString), not the exact binary expansion
        if (toks(id).exists(terms.contains)) Some(id ->
          BigDecimal(score.toString)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
      }.sortBy { case (id, s) => (-s, id) }
      assert(got.toSeq == want, s"corpus=$texts")
    }
  }

  test("duplicate spans equal brute-force k-gram islands on random corpora") {
    // tiny vocabulary forces cross-doc k-gram collisions; brute force
    // recomputes grams → docs-with-gram → per-doc position islands
    val k = 3
    val docGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(6, docGen)
    samples(corpusGen, 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.Dedup
        .duplicateSpansOn(docs.toDF("doc_id", "text"), k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // brute force
      val grams = docs.flatMap { case (id, t) =>
        t.split("\\s+").filter(_.nonEmpty).sliding(k).filter(_.size == k)
          .zipWithIndex.map { case (g, p) => (id, p, g.mkString(" ")) }
      }
      val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
        .keySet
      val want = grams.filter(g => dup(g._3)).groupBy(_._1).flatMap {
        case (id, rows) =>
          val ps = rows.map(_._2).sorted
          // split sorted positions into consecutive runs
          ps.foldLeft(List.empty[List[Int]]) {
            case (run :: rest, p) if p == run.head + 1 => (p :: run) :: rest
            case (acc, p) => List(p) :: acc
          }.map(run => (id, run.min.toLong, (run.max + k - 1).toLong,
            run.size.toLong))
      }.toSet
      assert(got == want, s"corpus=$texts")
    }
  }

  test("incremental dedup sink equals a global first-wins fold over batches") {
    // tiny vocabulary forces cross-batch and within-batch fingerprint
    // collisions; the sunk corpus must equal folding the batches in
    // order, keeping the lowest doc_id per canonical fingerprint first
    import graft.functions.TextFunctions.{fingerprint => fpCol}
    val docGen = Gen.listOfN(3, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    samples(Gen.listOfN(24, docGen), 3).zipWithIndex.foreach {
      case (texts, caseNo) =>
        val out = java.nio.file.Files
          .createTempDirectory(s"incprop$caseNo").toString
        val batches = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .grouped(8).toSeq
        batches.zipWithIndex.foreach { case (b, epoch) =>
          graft.streaming.DocStream.incrementalDedupSinkEachBatch(out)(
            b.toDF("doc_id", "text"), epoch.toLong)
        }
        val got = spark.read.parquet(out).select("doc_id").as[Long]
          .collect().toSet
        // driver-side fold (canonical fp via the engine's own column, so
        // the normalization can never drift from the operator's)
        val fps = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
          .select(col("doc_id"), fpCol(col("text")).as("fp"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val want = scala.collection.mutable.Set.empty[Long]
        val seen = scala.collection.mutable.Set.empty[String]
        batches.foreach { b =>
          b.groupBy(d => fps(d._1)).toSeq
            .map { case (fp, ds) => (fp, ds.map(_._1).min) }
            .sortBy(_._2)
            .foreach { case (fp, id) =>
              if (!seen(fp)) { seen += fp; want += id }
            }
        }
        assert(got == want.toSet, s"case $caseNo: $texts")
    }
  }

  test("salted join equals plain join on random key distributions") {
    val cases = samples(Gen.zip(
      Gen.listOfN(200, Gen.chooseNum(1L, 10L)), Gen.chooseNum(1, 7)), 5)
    val right = (1L to 10L).map(i => (i, i * 2)).toDF("k", "v")
    cases.foreach { case (keys, buckets) =>
      val left = keys.toDF("k")
      val plain = left.join(right, Seq("k")).groupBy("k")
        .agg(count(lit(1)), sum("v")).collect().map(_.toSeq).toSet
      val salted = graft.operators.SkewJoin
        .saltedJoin(left, right, "k", buckets).groupBy("k")
        .agg(count(lit(1)), sum("v")).collect().map(_.toSeq).toSet
      assert(salted == plain, s"buckets=$buckets")
    }
  }

  test("MinK quota aggregator equals sort-take under any partition split") {
    // the merge path is what production exercises (map-side partial
    // aggs combining across partitions); randomize the split so
    // reduce/merge interleavings are covered, including duplicate
    // hash keys where the id tiebreak decides
    val caseGen = for {
      n     <- Gen.chooseNum(0, 60)
      k     <- Gen.chooseNum(1, 8)
      pairs <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 1000L)))
      cut   <- Gen.chooseNum(0, math.max(n, 1))
    } yield (pairs, k, cut)
    samples(caseGen, 40).foreach { case (pairs, k, cut) =>
      val agg = new graft.functions.MinKLongAggregator(k)
      val (a, b) = pairs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      val expected = pairs.sorted(Ordering.Tuple2[Long, Long]).take(k)
      assert(agg.finish(merged) == expected, s"k=$k cut=$cut")
    }
  }

  test("byte-level tokenizer+hashing equals the String reference on " +
      "adversarial unicode/whitespace") {
    // the round-9 kernels tokenize UTF-8 BYTES and hash token regions;
    // this pins them (through gramHashes, no dedup to mask order bugs)
    // against an independent String-side reference — split("\\s+") +
    // md5LongScala — on text drawn from multi-byte alphabets (CJK,
    // accents, emoji, ß) joined by random ASCII-whitespace runs with
    // random leading/trailing noise
    import graft.functions.TextFunctions.md5LongScala
    val ws = Gen.listOfN(2, Gen.oneOf(' ', '\t', '\n', '', '\f', '\r'))
      .flatMap(l => Gen.chooseNum(1, 2).map(n => l.take(n).mkString))
    val tokChar = Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ß', 'ø', '中', '文', '字', 'Ω', 'λ'))
    val tok = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, tokChar).map(_.mkString))
    val textG = for {
      n    <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, tok)
      seps <- Gen.listOfN(n + 1, ws)
      lead <- Gen.oneOf("", " ", "\t ")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString
    val rows = samples(textG, 60)
    val got = rows.toDF("text")
      .select(org.apache.spark.sql.graft.TextExpressions
        .gramHashes(col("text"), 2).as("g"))
      .collect().map(_.getSeq[Long](0).toList)
    val expected = rows.map { t =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 2) Nil
      else toks.sliding(2).map(p => md5LongScala(p.mkString(" "))).toList
    }
    rows.lazyZip(got).lazyZip(expected).foreach { (t, g, e) =>
      assert(g == e, s"byte path diverged on ${t.map(_.toInt)}")
    }
  }

  test("dsir feature buckets equal the String reference " +
      "(unigrams ++ bigrams, pmod)") {
    // the q97 kernel emits every unigram and adjacent-bigram OCCURRENCE
    // as md5-60 mod buckets in one byte-level pass; reference: the
    // composed String-side definition the oracle replays
    import graft.functions.TextFunctions.md5LongScala
    val B = graft.operators.Sampling.DsirBuckets
    val tok = Gen.chooseNum(1, 5)
      .flatMap(n => Gen.listOfN(n,
        Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', '中', 'Ω'))).map(_.mkString))
    val textG = for {
      n    <- Gen.chooseNum(0, 10)
      toks <- Gen.listOfN(n, tok)
      lead <- Gen.oneOf("", "  ", "\t")
    } yield lead + toks.mkString(" ")
    val rows = samples(textG, 60)
    val got = rows.toDF("text")
      .select(org.apache.spark.sql.graft.TextExpressions
        .dsirFeatureBuckets(col("text"), B).as("b"))
      .collect().map(_.getSeq[Long](0).toList)
    val expected = rows.map { t =>
      val toks = t.split("\\s+").filter(_.nonEmpty).toList
      val feats = toks ++ toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" "))
      feats.map(f => math.floorMod(md5LongScala(f), B).toLong)
    }
    rows.lazyZip(got).lazyZip(expected).foreach { (t, g, e) =>
      assert(g == e, s"dsir kernel diverged on '$t'")
    }
  }

  test("cdc segments kernel equals the String reference") {
    // boundary after every token with md5-60 ≡ 0 mod p (p small so
    // random text actually hits boundaries), last token always closes;
    // segment hash = md5-60 of the tokens joined by ' '
    import graft.functions.TextFunctions.md5LongScala
    val p = 4
    val tok = Gen.chooseNum(1, 4)
      .flatMap(n => Gen.listOfN(n,
        Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', '中'))).map(_.mkString))
    val textG = for {
      n    <- Gen.chooseNum(0, 14)
      toks <- Gen.listOfN(n, tok)
    } yield toks.mkString(" ")
    val rows = samples(textG, 60)
    val got = rows.toDF("text")
      .select(org.apache.spark.sql.graft.TextExpressions
        .cdcSegments(col("text"), p).as("s"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1))).toList)
    val expected = rows.map { t =>
      val toks = t.split("\\s+").filter(_.nonEmpty).toList
      if (toks.isEmpty) Nil
      else {
        val out = scala.collection.mutable.ListBuffer[(Long, Long)]()
        var seg = List.empty[String]
        toks.zipWithIndex.foreach { case (w, i) =>
          seg :+= w
          if (md5LongScala(w) % p == 0 || i == toks.length - 1) {
            out += ((seg.length.toLong, md5LongScala(seg.mkString(" "))))
            seg = Nil
          }
        }
        out.toList
      }
    }
    rows.lazyZip(got).lazyZip(expected).foreach { (t, g, e) =>
      assert(g == e, s"cdc kernel diverged on '$t'")
    }
  }

  test("gopher repetition kernel equals the String reference " +
      "(all nine signals, unicode codepoint accounting)") {
    // the q101 kernel groups gram identities by a byte-level poly hash
    // and counts codepoints straight off UTF-8 lead bytes; reference:
    // HashMap on the gram STRING, codePointCount per token — short
    // repetitive token alphabet so grams actually collide
    val tok = Gen.oneOf("a", "bb", "ccc", "中", "é文", "a", "bb")
    val textG = for {
      n    <- Gen.chooseNum(0, 18)
      toks <- Gen.listOfN(n, tok)
      lead <- Gen.oneOf("", " ", "\t ")
    } yield lead + toks.mkString(" ")
    val rows = samples(textG, 60)
    val got = rows.toDF("text")
      .select(org.apache.spark.sql.graft.TextExpressions
        .gopherRepetitionStats(col("text")).as("s"))
      .collect().map { r =>
        val s = r.getStruct(0); (0 to 9).map(s.getLong).toList
      }
    val expected = rows.map { t =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val cp = toks.map(w => w.codePointCount(0, w.length).toLong)
      val total = cp.sum
      val stats = (2 to 10).map { n =>
        val grams = (0 to toks.length - n)
          .map(i => toks.slice(i, i + n).mkString(" ") ->
            cp.slice(i, i + n).sum)
        // .values (not .map on the Map — that would key by count and
        // collapse distinct grams)
        val counts = grams.groupBy(_._1).values
          .map(g => (g.length.toLong, g.head._2))
        if (counts.isEmpty) 0L
        else if (n <= 4) counts.map { case (c, ch) => c * ch }.max
        else counts.collect { case (c, ch) if c >= 2 => c * ch }.sum
      }
      total +: stats.toList
    }
    rows.lazyZip(got).lazyZip(expected).foreach { (t, g, e) =>
      assert(g == e, s"repetition kernel diverged on '$t'")
    }
  }

  test("kmv min-k is split-invariant: any partition of any stream " +
    "re-tops-k to the one-shot sketch (random data, random cut)") {
    import org.apache.spark.sql.functions.{col, lit}
    val caseGen = Gen.zip(
      Gen.listOfN(400, Gen.chooseNum(0L, 150L)), // duplicates guaranteed
      Gen.chooseNum(1, 399))
    samples(caseGen, 8).foreach { case (vals, cut) =>
      val vs = vals.map(v => s"u-$v")
      val (a, b) = vs.splitAt(cut)
      def regsOf(part: Seq[String]) =
        if (part.isEmpty) operators.Sketches.kmvRegisters(
          Seq("sentinel").toDF("uid").withColumn("g", lit("x")).limit(0),
          "g", col("uid"), k = 16)
        else operators.Sketches.kmvRegisters(
          part.toDF("uid").withColumn("g", lit("x")), "g", col("uid"),
          k = 16)
      val merged = operators.Sketches
        .kmvTopK(regsOf(a).union(regsOf(b)), Seq("g"), k = 16)
        .collect().map(_.getLong(1)).sorted.toSeq
      val whole = operators.Sketches
        .kmvRegisters(vs.toDF("uid").withColumn("g", lit("x")),
          "g", col("uid"), k = 16)
        .collect().map(_.getLong(1)).sorted.toSeq
      assert(merged == whole, s"cut=$cut diverged")
    }
  }

  test("minKDistinct equals brute-force k-smallest-distinct on random " +
    "multi-scope streams") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 60L))
    val caseGen = Gen.listOfN(300, rowGen)
    samples(caseGen, 10).foreach { rows =>
      val got = operators.Sketches.minKDistinct(rows.iterator, 8)
        .toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val want = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.sorted.take(8)).toMap
      assert(got == want)
    }
  }

  test("batched erasure invariants on random layouts: exact accounting, " +
    "survivors byte-exact, NULL keys immortal, re-delete is a no-op") {
    import operators.{BloomSkip, Layouts}
    // random orders-shaped tables with nullable keys and random batches
    val rowGen = for {
      ok <- Gen.chooseNum(0L, 4000L)
      ck <- Gen.frequency(9 -> Gen.chooseNum(1L, 40L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
      tp <- Gen.chooseNum(1, 999999).map(_ / 100.0)
    } yield (ok, ck, tp)
    val caseGen = for {
      rows <- Gen.listOfN(300, rowGen)
      ks <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 45L)).map(_.distinct.take(6))
    } yield (rows.distinctBy(_._1), ks)
    samples(caseGen, 4).zipWithIndex.foreach { case ((rows, delKeys), i) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"eraseprop$i").toString + "/layout"
      val df = rows.toDF("o_orderkey", "o_custkey", "o_totalprice")
      BloomSkip.bloomWrite(df, "o_custkey", "o_orderkey", dir)
      val out = s"$dir.forget"
      val report = BloomSkip.deleteKeysFrom(spark, dir, out, delKeys)
      val want = rows.filterNot(_._2.exists(delKeys.contains))
      // exact accounting incl. NULL-keyed rows (they must survive)
      assert(report.rowsDeleted == (rows.size - want.size).toLong)
      val got = Layouts.readFiles(spark, out)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) Option.empty[Long] else Option(r.getLong(1)),
          r.getDouble(2))).toSet
      assert(got == want.toSet, s"case $i: survivors diverged")
      // the patched index still has no false negatives for survivors
      val keysLeft = want.flatMap(_._2).distinct
      if (keysLeft.nonEmpty) {
        val found = BloomSkip.lookupIn(spark, out,
          keysLeft.take(BloomSkip.MaxProbeKeys))
          .select("o_orderkey").collect().map(_.getLong(0)).toSet
        assert(found == want.filter(_._2.isDefined).map(_._1).toSet,
          s"case $i: post-delete lookup lost or invented rows")
      }
      // deleting the same batch from the result is a no-op
      val report2 = BloomSkip.deleteKeysFrom(spark, out,
        s"$dir.forget2", delKeys)
      assert(report2.rowsDeleted == 0L, s"case $i: re-delete moved rows")
      assert(Layouts.readFiles(spark, s"$dir.forget2").count() ==
        want.size.toLong)
    }
  }

  test("vacuum invariants on random lineage DAGs: retained reads stay " +
    "byte-identical, shared files survive by reference counting, a " +
    "second pass is a no-op, expired reads fail typed") {
    import operators.{BloomSkip, Layouts}
    val rowGen = for {
      ok <- Gen.chooseNum(0L, 4000L)
      ck <- Gen.chooseNum(1L, 40L)
      tp <- Gen.chooseNum(1, 999999).map(_ / 100.0)
    } yield (ok, ck, tp)
    val caseGen = for {
      rows <- Gen.listOfN(250, rowGen)
      nSteps <- Gen.chooseNum(2, 4)
      batches <- Gen.listOfN(nSteps,
        Gen.nonEmptyListOf(Gen.chooseNum(1L, 45L)).map(_.distinct.take(4)))
      parents <- Gen.listOfN(nSteps, Gen.chooseNum(0, 100))
      keepLast <- Gen.chooseNum(1, 3)
    } yield (rows.distinctBy(_._1), batches, parents, keepLast)
    samples(caseGen, 3).zipWithIndex.foreach {
      case ((rows, batches, parents, keepLast), i) =>
        val root = java.nio.file.Files
          .createTempDirectory(s"vacprop$i").toString
        val base = s"$root/v1"
        BloomSkip.bloomWrite(rows.toDF("o_orderkey", "o_custkey",
          "o_totalprice"), "o_custkey", "o_orderkey", base)
        val log = s"$root/log"
        Layouts.commitVersion(log, base)
        // a random DAG: each erasure builds from a RANDOM existing
        // version, so files are shared across arbitrary chains (a
        // no-hit batch even shares EVERYTHING with its parent)
        var paths = Vector(base)
        batches.zip(parents).zipWithIndex.foreach { case ((ks, pi), j) =>
          val parent = paths(pi % paths.size)
          val out = s"$root/f${j + 2}"
          BloomSkip.deleteKeysFrom(spark, parent, out, ks)
          Layouts.commitVersion(log, out)
          paths :+= out
        }
        val before = Layouts.versions(log)
        val retained = before.takeRight(keepLast)
        def snap(p: String) = Layouts.readFiles(spark, p)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .collect().map(_.toSeq).toSet
        val snapshots = retained.map { case (id, p) => (id, snap(p)) }
        Layouts.vacuum(spark, log, keepLast)
        // every retained version reads byte-identical after the pass,
        // and every dir its manifest references is still on disk
        snapshots.foreach { case (id, s) =>
          assert(Layouts.readAsOf(spark, log, id)
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .collect().map(_.toSeq).toSet == s,
            s"case $i: retained v$id changed under vacuum")
        }
        retained.foreach { case (id, p) =>
          Layouts.manifestOf(spark, p).values.foreach { d =>
            assert(new java.io.File(d).exists(),
              s"case $i: v$id references deleted dir $d")
          }
        }
        // idempotent: a second pass expires and deletes nothing
        val r2 = Layouts.vacuum(spark, log, keepLast)
        assert(r2.versionsExpired == 0L && r2.filesDeleted == 0L,
          s"case $i: vacuum not idempotent: $r2")
        // expired versions fail with the typed error
        before.dropRight(keepLast).foreach { case (id, _) =>
          intercept[Layouts.VersionExpired] {
            Layouts.readAsOf(spark, log, id)
          }
        }
    }
  }

  test("cms estimate dominates the true count on random skewed streams " +
    "(one-sided error, any duplication profile)") {
    val caseGen = Gen.listOfN(500,
      Gen.frequency(5 -> Gen.chooseNum(0L, 5L), 1 -> Gen.chooseNum(6L, 400L)))
    samples(caseGen, 6).foreach { items =>
      val out = operators.Sketches.cmsCountsOn(
        spark.createDataset(items).toDF("item"), "item").collect()
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
      out.foreach { r =>
        assert(r.getLong(1) >= truth(r.getLong(0)),
          s"cms under-counted item ${r.getLong(0)}")
        assert(r.getLong(2) == truth(r.getLong(0)), "exact column wrong")
      }
      graft.Caches.releaseAll()
    }
  }

  test("incremental cluster table equals the batch assignment under " +
    "random corpora, random epoch splits, and a mid-stream takedown") {
    // small word pool + short docs → frequent shingle overlap, so the
    // generated corpora have real multi-doc clusters and chains whose
    // merges cross epoch boundaries in arbitrary ways
    val pool = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val docGen = Gen.listOfN(8, Gen.oneOf(pool)).map(_.mkString(" "))
    val caseGen = Gen.zip(
      Gen.listOfN(20, docGen),                    // texts (doc_id = idx)
      Gen.listOfN(20, Gen.chooseNum(0, 3)),       // epoch of each doc
      Gen.someOf(0L until 12L))                   // takedown candidates
    samples(caseGen, 5).zipWithIndex.foreach {
      case ((texts, epochs, delCand), i) =>
        val outDir = java.nio.file.Files
          .createTempDirectory(s"clus_prop_$i").toString
        val docs = texts.zipWithIndex
          .map { case (t, d) => (d.toLong, t, epochs(d)) }
        def batch(e: Int) = docs.filter(_._3 == e)
          .map(d => (d._1, d._2)).toDF("doc_id", "text")
        // ingest epochs 0..1, take down mid-stream, ingest 2..3
        (0 to 1).foreach(e =>
          streaming.ClusterStream.ingestBatch(batch(e), outDir, e.toLong))
        val ingested = docs.filter(_._3 <= 1).map(_._1).toSet
        val dels = delCand.filter(ingested).toSeq.sorted
        if (dels.nonEmpty)
          streaming.ClusterStream.takedownClusters(spark, outDir, dels)
        (2 to 3).foreach(e =>
          streaming.ClusterStream.ingestBatch(batch(e), outDir, e.toLong))
        // the takedown expanded through whole clusters: erased = the
        // dels' components among the docs ingested before the takedown
        val preDocs = docs.filter(_._3 <= 1).map(d => (d._1, d._2))
          .toDF("doc_id", "text")
        val preAsg = streaming.ClusterStream.batchAssignmentOn(preDocs)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        graft.Caches.releaseAll()
        val delComps = dels.map(preAsg).toSet
        val erased = preAsg.collect {
          case (d, c) if delComps(c) && dels.contains(d) => d
        }.toSet
        // dels are whole components' SEEDS only when requested ids are
        // the full membership; takedownClusters erases exactly the ids
        // (survivors relabel) — golden = batch over everything except
        // the requested ids
        val retained = docs.map(d => (d._1, d._2))
          .filterNot(d => dels.contains(d._1))
          .toDF("doc_id", "text")
        val want = streaming.ClusterStream.batchAssignmentOn(retained)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        graft.Caches.releaseAll()
        val got = streaming.ClusterStream.assignmentTable(spark, outDir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        graft.Caches.releaseAll()
        assert(got == want,
          s"case $i (dels=$dels erased=$erased): got $got want $want")
    }
  }
}
