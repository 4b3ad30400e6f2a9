package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The version log PROMOTED to the served layouts (round-15 verdict
  * #2): every base build and forget commits to a per-layout lineage,
  * retention runs through manifest reference counting
  * ([[Layouts.vacuumRetain]]) instead of hand-maintained stale lists,
  * readers keep the deferred-reaper grace, and time travel serves over
  * HTTP with 410 for expired snapshots. */
class ServedLineageSpec extends SparkSpec {
  import spark.implicits._

  /** A private corpus so lineage version ids are deterministic
    * regardless of what other suites did to the shared sf lineage. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("lineage").toString
    (0 until 200).map(i => (i.toLong, (i % 20).toLong, i * 1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  test("base build and every forget commit to the lineage; a " +
      "superseded forget expires by reference counting but its " +
      "reader survives under the reaper's grace") {
    graft.IndexGc.reset()
    val grace0 = graft.IndexGc.graceMs; graft.IndexGc.graceMs = 0L
    try {
      val (base, _) = BloomSkip.layoutCached(spark, dir)
      val log = BloomSkip.lineageLogOf(base)
      assert(Layouts.versions(log).map(_._1) == Seq(1L))
      val (pA, _) = BloomSkip.forgottenLayoutCached(spark, dir, Seq(7L))
      assert(Layouts.versions(log).map(_._1) == Seq(1L, 2L))
      // a reader that resolved version 2 before the next forget…
      val heldRows = BloomSkip.lookupIn(spark, pA, Seq(13L)).count()
      assert(heldRows > 0)
      val (pB, _) = BloomSkip.forgottenLayoutCached(spark, dir, Seq(13L))
      // …sees version 2 EXPIRE from the log (reference counting: only
      // v2's own rewritten dirs are condemned — base files are shared
      // into retained manifests and survive untouched)
      assert(Layouts.versions(log).map(_._1) == Seq(1L, 3L))
      assert(new java.io.File(pA).exists(),
        "expired version's files must outlive the expiry by the grace")
      assert(BloomSkip.lookupIn(spark, pA, Seq(13L)).count() == heldRows,
        "the in-flight reader of the expired version must still answer")
      // one more refresh cycle reaps the aged generation (grace 0)
      val (pC, _) = BloomSkip.forgottenLayoutCached(spark, dir, Seq(3L))
      assert(!new java.io.File(pA).exists(),
        "two refreshes past, the expired version's own dirs are reaped")
      assert(new java.io.File(base).exists() &&
        new java.io.File(pB).exists() && new java.io.File(pC).exists())
      assert(Layouts.versions(log).map(_._1) == Seq(1L, 4L))
    } finally {
      graft.IndexGc.graceMs = grace0
      graft.IndexGc.reset()
    }
  }

  test("time travel over the served lineage: v1 answers pre-forget, " +
      "the head post-forget, an expired version fails typed, an " +
      "uncommitted one plain") {
    val (base, _) = BloomSkip.layoutCached(spark, dir)
    val log = BloomSkip.lineageLogOf(base)
    val head = Layouts.versions(log).last._1
    // v1: the forgotten key is still THERE — yesterday's snapshot
    val v1Rows = BloomSkip.lookupAsOf(spark, dir, 1L, Seq(3L))
      .select("o_custkey").as[Long].collect()
    assert(v1Rows.nonEmpty && v1Rows.forall(_ == 3L))
    // head: the current forget applied (key 3 was the last batch)
    assert(BloomSkip.lookupAsOf(spark, dir, head, Seq(3L)).count() == 0L)
    intercept[Layouts.VersionExpired] {
      BloomSkip.lookupAsOf(spark, dir, 2L, Seq(3L))
    }
    val e = intercept[IllegalArgumentException] {
      BloomSkip.lookupAsOf(spark, dir, head + 100L, Seq(3L))
    }
    assert(!e.isInstanceOf[Layouts.VersionExpired] &&
      e.getMessage.contains("never committed"))
  }

  test("admin retention never expires the serving base or the live " +
      "head; lineageVersions flags the base") {
    val report = BloomSkip.vacuumServedLineage(spark, dir, keepLast = 1)
      .collect()(0)
    assert(report.getLong(0) == 0L,
      "base + head are pinned; nothing else is left to expire")
    val vs = BloomSkip.lineageVersions(spark, dir).collect()
    assert(vs.length == 2 && vs.head.getBoolean(2),
      s"expected base + head, got ${vs.mkString("; ")}")
  }

  test("410 through HTTP: /timeTravel serves live versions and " +
      "answers Gone for vacuum-expired ones") {
    val srv = new graft.serving.HttpServer(spark, dir).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    def get(url: String): (Int, String) = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("GET")
      val code = conn.getResponseCode
      val in = if (code < 400) conn.getInputStream else conn.getErrorStream
      val body = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      conn.disconnect()
      (code, body)
    }
    try {
      val (c1, v1) = get(s"$base/timeTravel?version=1&keys=3")
      assert(c1 == 200 && v1.contains("\"o_custkey\":3,"), v1.take(200))
      val (c2, gone) = get(s"$base/timeTravel?version=2&keys=3")
      assert(c2 == 410 && gone.contains("expired"), s"$c2 $gone")
      val (c3, _) = get(s"$base/timeTravel?version=999&keys=3")
      assert(c3 == 400)
      val (c4, lin) = get(s"$base/lineage")
      assert(c4 == 200 && lin.contains("\"is_base\":true"), lin.take(200))
      val (c5, vac) = get(s"$base/vacuumLayouts?keepLast=1")
      assert(c5 == 200 && vac.contains("\"versions_expired\":0"),
        vac.take(200))
    } finally srv.stop()
  }
}
