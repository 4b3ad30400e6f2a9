package graft.operators

import graft.SparkSpec

/** The bucketed layout must (a) keep results identical to the plain join
  * and (b) eliminate the shuffle before the fact⋈fact join. */
class BucketingSpec extends SparkSpec {

  test("bucketed order-wide join: same result, no shuffle in the plan") {
    Warehouse.bucketize(spark, sf, buckets = 4)
    // at test scale the optimizer would broadcast tiny orders; disable so
    // the plan shows what a 100 TB fact⋈fact join would do (SMJ)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, bucketedRows) =
      try {
        val df = Warehouse.orderWideBucketed(spark)
        (df.queryExecution.executedPlan.toString(), df.collect())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(!plan.contains("ShuffleExchange") &&
      !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must be shuffle-free, plan was:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join over buckets, plan was:\n$plan")

    val plain = OrderWide.orderWide(spark, sf)
      .select("order_id", "detail_id", "user_id", "order_price",
        "split_total_amount")
    val a = bucketedRows.map(_.toSeq).toSet
    val b = plain.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  // ——— Z-order layout (q140) ———

  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("z-key interleave: hand trace and SQL ≡ Scala on random values") {
    // user=5 (101b) on odd bits → 2+32=34; item=3 (011b) on even → 1+4=5
    assert(Warehouse.interleaveScala(5L, 3L) == 39L)
    assert(Warehouse.interleaveScala(0L, 0L) == 0L)
    val rnd = new scala.util.Random(99)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 21).toLong,
      rnd.nextInt(1 << 21).toLong))
    val got = pts.toDF("x", "y")
      .withColumn("z", expr(Warehouse.zorderTermsSql("x", "y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == Warehouse.interleaveScala(x, y))
    }
  }

  test("quadrant identity: zkey >> shift addresses the aligned " +
    "2^(s/2)-square cell — interleave(x >> s/2, y >> s/2)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500; shift <- Seq(4, 10, 16)) {
      val (x, y) = (rnd.nextInt(1 << 21).toLong, rnd.nextInt(1 << 21).toLong)
      assert((Warehouse.interleaveScala(x, y) >> shift) ==
        Warehouse.interleaveScala(x >> (shift / 2), y >> (shift / 2)),
        s"x=$x y=$y shift=$shift")
    }
  }

  test("z-layout bounds BOTH dimensions per file; arrival order bounds " +
    "neither — an item-range predicate prunes only under z") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
    val zRep = Warehouse.zorderLayoutOn(ev, "user_id", "item", shift = 10)
      .collect().map(r => (r.getLong(4), r.getLong(5))) // (i_min, i_max)
    // arrival-order baseline: files of equal size in event_id order
    val n = ev.count()
    val per = math.max(1L, n / zRep.length) // same file count
    val naive = ev
      .withColumn("file_id", expr(s"event_id div $per"))
      .groupBy("file_id")
      .agg(min(col("item")).as("i_min"), max(col("item")).as("i_max"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def overlapping(rep: Seq[(Long, Long)], lo: Long, hi: Long) =
      rep.count { case (mn, mx) => mx >= lo && mn <= hi }
    val (zTouch, nTouch) =
      (overlapping(zRep.toSeq, 10, 19), overlapping(naive.toSeq, 10, 19))
    assert(zTouch < nTouch,
      s"z-layout must prune: z touches $zTouch of ${zRep.length}, " +
        s"arrival $nTouch of ${naive.length}")
    assert(zTouch <= zRep.length / 2, s"z pruning too weak: $zTouch")
  }

  test("zorderScan serves the rectangle from the cached layout with a " +
    "live partition prune, row-equal to the plain filter") {
    import spark.implicits._
    val got = Warehouse.zorderScan(spark, sf, 0L, 40L, 10L, 19L)
    val want = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull &&
        col("user_id").between(0, 40) && col("item").between(10, 19))
    assert(got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      want.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // the pruning is REAL: the scan's post-prune file selection is a
    // strict subset of the layout's files
    got.collect()
    // the orderBy makes the plan adaptive: the scan leaves (and their
    // metrics) live under the AQE node's final plan
    def scanFiles(p: org.apache.spark.sql.execution.SparkPlan): Long =
      p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => scanFiles(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scanFiles(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
        case _ => p.children.map(scanFiles).sum
      }
    val read = scanFiles(got.queryExecution.executedPlan)
    val all = spark.read.parquet(Warehouse.zlayoutCached(spark, sf))
      .inputFiles.length
    assert(read < all && read > 0, s"pruned scan read $read of $all files")
    // path-level pruning through the version manifest: every file the
    // scan even LISTS lies in a quadrant-candidate directory (stronger
    // than a partition filter — pruned quadrants are never enumerated)
    val candDirs = Warehouse.zorderQuadrants(0L, 40L, 10L, 19L)
      .map(q => s"/file_id=$q/").toSet
    val listed = got.inputFiles
    assert(listed.nonEmpty && listed.forall(f =>
      candDirs.exists(f.contains)),
      s"scan listed a pruned quadrant:\n${listed.mkString("\n")}")
    // a rectangle wider than the quadrant cap falls back to the plain
    // scan — same rows, no driver-side grid enumeration
    val wide = Warehouse.zorderScan(spark, sf, 0L, (1L << 21) - 1,
      0L, (1L << 21) - 1)
    assert(wide.count() ==
      graft.Tables.events(spark, sf)
        .where(get_json_object(col("props"), "$.k").isNotNull).count())
    // served bounds are validated
    intercept[IllegalArgumentException] {
      Warehouse.zorderScan(spark, sf, -1L, 5L, 0L, 5L)
    }
    intercept[IllegalArgumentException] {
      Warehouse.zorderScan(spark, sf, 5L, 1L, 0L, 5L)
    }
  }

  test("deinterleave inverts interleave across the domain corners") {
    val lim = (1L << Warehouse.ZBits) - 1
    for (x <- Seq(0L, 1L, 40L, 12345L, lim); y <- Seq(0L, 7L, 999L, lim))
      assert(Warehouse.deinterleaveScala(
        Warehouse.interleaveScala(x, y)) == ((x, y)), s"($x, $y)")
  }

  test("q155 erasure through the z-layout: only the user's quadrant " +
    "stripe rewritten, untouched quadrants shared, the user gone, " +
    "everyone else intact") {
    import spark.implicits._
    val src = Warehouse.zlayoutCached(spark, sf)
    val user = 7L
    val out = s"$src.spec_zforget"
    val report = Warehouse.zorderDeleteUser(spark, src, out, user)
    val mfSrc = Layouts.manifestOf(spark, src)
    val cands = Warehouse.zorderUserCandidates(mfSrc.keySet, user)
    // candidates are exactly the x-stripe (at sf0.001 the 4-quadrant
    // layout sits entirely in user 7's stripe — strict pruning is
    // proven on the wide synthetic layout below)
    assert(report.filesRewritten == cands.size && cands.nonEmpty)
    assert(report.filesShared == mfSrc.size - cands.size)
    // exact accounting: every indexed row of the user fell out
    val exact = graft.Tables.events(spark, sf)
      .where(get_json_object(col("props"), "$.k").isNotNull &&
        col("user_id") === user).count()
    assert(report.rowsDeleted == exact && exact > 0)
    // untouched quadrants SHARED (same physical path), the version's
    // own directory holds only candidate stripes
    val mfOut = Layouts.manifestOf(spark, out)
    mfOut.filterNot { case (f, _) => cands(f) }.foreach { case (f, p) =>
      assert(p == mfSrc(f), s"untouched quadrant $f copied, not shared")
    }
    val ownDirs = Layouts.listFileDirs(new java.io.File(out)).keySet
    assert(ownDirs.subsetOf(cands))
    // the probe through the forgotten version: the user absent, every
    // other row of the rectangle present
    val got = Warehouse.zorderScanIn(spark, out, 0L, 40L, 10L, 19L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull && col("user_id").between(0, 40) &&
        col("item").between(10, 19) && col("user_id") =!= user)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want && want.nonEmpty)
    assert(!got.exists(_._2 == user))
  }

  test("q158 batched z-order erasure: two users delete in ONE " +
    "stripe-union rewrite, both gone, everyone else intact") {
    import spark.implicits._
    val src = Warehouse.zlayoutCached(spark, sf)
    val users = Seq(7L, 13L)
    val out = s"$src.spec_zbatch"
    val report = Warehouse.zorderDeleteUsers(spark, src, out, users)
    val mfSrc = Layouts.manifestOf(spark, src)
    val union = users
      .flatMap(u => Warehouse.zorderUserCandidates(mfSrc.keySet, u)).toSet
    assert(report.filesRewritten == union.size && union.nonEmpty)
    val exact = graft.Tables.events(spark, sf)
      .where(get_json_object(col("props"), "$.k").isNotNull &&
        col("user_id").isin(users: _*)).count()
    assert(report.rowsDeleted == exact && exact > 0)
    val got = Warehouse.zorderScanIn(spark, out, 0L, 40L, 10L, 19L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull && col("user_id").between(0, 40) &&
        col("item").between(10, 19) && !col("user_id").isin(users: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want && want.nonEmpty)
    assert(!got.exists(r => users.contains(r._2)))
  }

  test("q155 pruning is strict on a multi-stripe layout: deleting a " +
    "user rewrites only their x-stripe's quadrants") {
    import spark.implicits._
    // users span two x-cells (0..31 and 100..131 at shift=10/cell=32)
    val df = (0L until 256L).map(i =>
      (i, if (i % 2 == 0) i % 32 else 100 + i % 32, i % 64))
      .toDF("event_id", "user_id", "item")
    val dir = java.nio.file.Files.createTempDirectory("zforget")
      .toString + "/layout"
    Warehouse.zorderWrite(df, "user_id", "item", dir)
    val mf = Layouts.manifestOf(spark, dir)
    val report = Warehouse.zorderDeleteUser(spark, dir, s"$dir.f", 7L)
    assert(report.filesRewritten < report.filesTotal &&
      report.filesRewritten > 0,
      s"no pruning: ${report.filesRewritten} of ${report.filesTotal}")
    assert(report.rowsDeleted == df.where(col("user_id") === 7).count())
    // the survivors in user 7's own quadrants are intact too
    assert(Layouts.readFiles(spark, s"$dir.f").count() ==
      256L - report.rowsDeleted)
    assert(mf.size.toLong == report.filesTotal)
  }

  test("z-order domain guard is live: out-of-range or negative values " +
    "fail loudly instead of silently aliasing into a wrong quadrant") {
    import spark.implicits._
    val over = Seq((1L << 21, 5L), (3L, 4L)).toDF("x", "y")
    val neg = Seq((-1L, 5L)).toDF("x", "y")
    for (bad <- Seq(over, neg)) {
      val e = intercept[Exception] {
        Warehouse.zorderLayoutOn(bad, "x", "y", shift = 10).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("z-order domain violated")),
        s"wrong failure: $e")
    }
    // and the write path refuses too, leaving no partial layout behind
    val dir = java.nio.file.Files.createTempDirectory("zguard").toString
    intercept[Exception] {
      Warehouse.zorderWrite(neg, "x", "y", dir)
    }
  }

  test("zorderWrite: partitioned quadrants round-trip, and a range " +
    "predicate becomes a partition filter over zorderQuadrants") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(2000)((rnd.nextInt(200).toLong,
      rnd.nextInt(100).toLong))
    val df = pts.toDF("x", "y")
    Warehouse.zorderWrite(df, "x", "y", dir)
    val back = spark.read.parquet(dir)
    assert(back.select("x", "y").collect().map(r =>
      (r.getLong(0), r.getLong(1))).sorted.toSeq == pts.sorted)
    // reader-side pruning: quadrants for y ∈ [10, 19], x unconstrained
    val quads = Warehouse.zorderQuadrants(0L, 255L, 10L, 19L)
    val pruned = back.where(col("file_id").isin(quads: _*)
      && col("y").between(10, 19))
    val want = pts.filter { case (_, y) => y >= 10 && y <= 19 }.sorted
    assert(pruned.select("x", "y").collect().map(r =>
      (r.getLong(0), r.getLong(1))).sorted.toSeq == want,
      "quadrant pruning must not lose rows")
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("file_id"),
      s"expected a partition filter on file_id, plan:\n$plan")
    // and it actually pruned: the scan read fewer files than the table
    // has (inputFiles ignores partition filters; the scan metric does
    // not — it reports the post-pruning selection)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val all = back.inputFiles.length
    val read = filesRead(pruned)
    assert(read < all && read > 0, s"pruned scan read $read of $all")
  }
}
