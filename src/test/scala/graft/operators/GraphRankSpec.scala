package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank on the transition graph (q104): hand-traced integer
  * updates, and the driver-dispatch path pinned equal to the
  * distributed loop. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** One user walking k: 1→2→2→1→3.
    * Edges: (1→2,w1) (2→2,w1) (2→1,w1) (1→3,w1); wout(1)=2, wout(2)=2. */
  private def walk: DataFrame = {
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")
    Seq((7L, t(1), 1L, 1L), (7L, t(2), 2L, 2L), (7L, t(3), 3L, 2L),
      (7L, t(4), 4L, 1L), (7L, t(5), 5L, 3L))
      .toDF("user_id", "ts", "event_id", "k")
  }

  test("hand trace: one and two integer rounds") {
    // round 1 from r0 = 1e6:
    //   s(1) = r(2)·1/2 = 500000;  s(2) = r(1)/2 + r(2)/2 = 1000000;
    //   s(3) = r(1)/2 = 500000
    //   r1 = 150000 + 85·s div 100 → (575000, 1000000, 575000)
    val r1 = GraphRank.pageRankOn(walk, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 575000L, 2L -> 1000000L, 3L -> 575000L),
      s"round 1: $r1")
    // round 2: s(1) = 1000000/2; s(2) = 575000/2 + 1000000/2 = 787500;
    //   s(3) = 575000/2 = 287500
    //   → (575000, 150000 + 669375 = 819375, 150000 + 244375 = 394375)
    val r2 = GraphRank.pageRankOn(walk, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 575000L, 2L -> 819375L, 3L -> 394375L),
      s"round 2: $r2")
  }

  test("driver dispatch equals the distributed loop on the sf corpus") {
    def ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    val viaDriver = GraphRank.pageRankOn(ev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCluster = GraphRank.pageRankOn(ev, edgeBudget = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver.nonEmpty && viaDriver == viaCluster,
      s"paths diverge (${viaDriver.size} vs ${viaCluster.size} nodes)")
  }

  test("events without k are not nodes, and both dispatch paths agree " +
    "on such data") {
    // same walk with a k-less event spliced in: the walk SKIPS it, so
    // 2→(null)→1 contributes the 2→1 edge — one rule for both paths
    // (pre-fix, the driver path would have minted a phantom node 0)
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")
    val noisy = Seq(
      (7L, t(1), 1L, Some(1L)), (7L, t(2), 2L, Some(2L)),
      (7L, t(3), 3L, None), (7L, t(4), 4L, Some(1L)),
      (7L, t(5), 5L, Some(3L)))
      .toDF("user_id", "ts", "event_id", "k")
    val viaDriver = GraphRank.pageRankOn(noisy, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCluster = GraphRank.pageRankOn(noisy, iters = 2,
      edgeBudget = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaCluster, s"$viaDriver vs $viaCluster")
    assert(viaDriver.keySet == Set(1L, 2L, 3L), viaDriver.keySet)
  }

  test("every node appears with at least the teleport mass") {
    val out = GraphRank.pageRank(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.nonEmpty)
    assert(out.forall(_._2 >= GraphRank.TeleportMicros),
      "rank below teleport floor")
  }

  // —— triangle counting (q119) ——

  private def evRows(rows: Seq[(Long, Int, Long, Long)]): DataFrame = {
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")
    rows.map { case (u, sec, eid, k) => (u, t(sec), eid, k) }
      .toDF("user_id", "ts", "event_id", "k")
  }

  test("triangles: one triangle + a pendant edge, hand-traced") {
    // user 7 walks 1→2→3→1 (triangle); user 8 walks 3→4 (pendant);
    // user 9 walks 5→5 (self-loop, dropped — node 5 has no edge at all)
    val got = GraphRank.trianglesOn(evRows(Seq(
        (7L, 1, 1L, 1L), (7L, 2, 2L, 2L), (7L, 3, 3L, 3L), (7L, 4, 4L, 1L),
        (8L, 1, 5L, 3L), (8L, 2, 6L, 4L),
        (9L, 1, 7L, 5L), (9L, 2, 8L, 5L))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 2L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 1L, 0L)),
      s"got $got")
  }

  test("triangles equal the brute-force C(n,3) count on random graphs") {
    val rnd = new scala.util.Random(7)
    // random walks over 12 nodes → a dense-ish undirected graph
    val rows = (0 until 50).flatMap { u =>
      val walk = Seq.fill(2 + rnd.nextInt(4))(1L + rnd.nextInt(12))
      walk.zipWithIndex.map { case (k, i) =>
        (u.toLong, i + 1, u.toLong * 100 + i, k)
      }
    }
    val got = GraphRank.trianglesOn(evRows(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // brute force: rebuild the undirected edge set, try all C(n,3)
    val edges = rows.groupBy(_._1).values.flatMap { ev =>
      ev.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect {
        case Seq(a, b) if a != b => (math.min(a, b), math.max(a, b))
      }
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val want = nodes.map { n =>
      n -> nodes.combinations(3).count { case Seq(x, y, z) =>
        Seq(x, y, z).contains(n) &&
          edges((x, y)) && edges((x, z)) && edges((y, z))
      }.toLong
    }.toMap
    assert(got == want, s"got $got want $want")
  }

  // —— label propagation (q121) ——

  /** Scala reference: synchronous LPA, most-frequent neighbor label,
    * ties to the smallest label. */
  private def lpaRef(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nbrs = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = nbrs.keys.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      lbl = nbrs.map { case (n, ns) =>
        val counts = ns.groupBy(lbl).view.mapValues(_.size)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  test("label propagation: clique converges, 2-cycle oscillates — " +
      "both deterministic") {
    // isolated triangle {1,2,3} reaches all-1 and stays; the isolated
    // pair {7,8} oscillates with period 2 (synchronous LPA's documented
    // behavior) — after 5 (odd) rounds the labels sit swapped
    val got = GraphRank.labelPropagationOn(evRows(Seq(
        (1L, 1, 1L, 1L), (1L, 2, 2L, 2L), (1L, 3, 3L, 3L), (1L, 4, 4L, 1L),
        (2L, 1, 5L, 7L), (2L, 2, 6L, 8L))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 8L, 8L -> 7L),
      s"got $got")
    assert(got == lpaRef(Set((1L, 2L), (2L, 3L), (1L, 3L), (7L, 8L)), 5))
  }

  test("label propagation equals the reference on random graphs") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 60).flatMap { u =>
      val walk = Seq.fill(2 + rnd.nextInt(4))(1L + rnd.nextInt(14))
      walk.zipWithIndex.map { case (k, i) =>
        (u.toLong, i + 1, u.toLong * 100 + i, k)
      }
    }
    val edges = rows.groupBy(_._1).values.flatMap { ev =>
      ev.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect {
        case Seq(a, b) if a != b => (math.min(a, b), math.max(a, b))
      }
    }.toSet
    val got = GraphRank.labelPropagationOn(evRows(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lpaRef(edges, 5), s"got $got want ${lpaRef(edges, 5)}")
    // the distributed loop (edgeBudget = 0 forces it) matches the
    // driver dispatch exactly — the q104 two-path contract
    val dist = GraphRank.labelPropagationOn(evRows(rows), edgeBudget = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == got, "driver and distributed LPA paths diverged")
  }

  test("pageRankConvergence hand trace against the q104 walk") {
    // r0=(1e6,1e6,1e6) → r1=(575000,1000000,575000): nodes 1,3 move
    // by 425000 each → l1=850000, moved=2
    // r1 → r2=(575000,819375,394375): node2 by 180625, node3 by
    // 180625 → l1=361250, moved=2
    val got = GraphRank.pageRankConvergenceOn(walk, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 850000L, 2L), (2L, 361250L, 2L)), s"got $got")
  }

  test("convergence diagnostics: driver and distributed paths bit-equal " +
      "on the sf corpus") {
    def ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    val prD = GraphRank.pageRankConvergenceOn(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val prC = GraphRank.pageRankConvergenceOn(ev, edgeBudget = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(prD.size == 10 && prD == prC,
      s"pagerank convergence paths diverge:\n d=$prD\n c=$prC")
    // the trace is genuinely converging on this corpus
    assert(prD.last._2 < prD.head._2, s"no L1 decay: $prD")
    val lpD = GraphRank.labelPropagationConvergenceOn(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val lpC = GraphRank.labelPropagationConvergenceOn(ev, edgeBudget = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(lpD.size == 5 && lpD == lpC,
      s"lpa convergence paths diverge:\n d=$lpD\n c=$lpC")
  }

  test("lpaConvergence: clique flips reach zero, a 2-cycle's never do") {
    // triangle {1,2,3}: l0=(1,2,3) → (2,1,1) flips=3,comm=2 →
    // (1,1,1) flips=1,comm=1 → steady flips=0; pair {7,8} swaps every
    // round (flips=2) — the oscillation is VISIBLE in the trace
    val tri = GraphRank.labelPropagationConvergenceOn(evRows(Seq(
        (1L, 1, 1L, 1L), (1L, 2, 2L, 2L), (1L, 3, 3L, 3L), (1L, 4, 4L, 1L))),
        iters = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(tri == Seq((3L, 2L), (1L, 1L), (0L, 1L), (0L, 1L)), s"tri $tri")
    val pair = GraphRank.labelPropagationConvergenceOn(evRows(Seq(
        (2L, 1, 5L, 7L), (2L, 2, 6L, 8L))), iters = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(pair == Seq((2L, 2L), (2L, 2L), (2L, 2L)), s"pair $pair")
  }

  test("personalized rank: hand trace of two seeded integer rounds") {
    // seed 1, n = 3: r0 = (3e6, 0, 0); teleport = 450000 at the seed
    // round 1: s(2) = 3e6/2, s(3) = 3e6/2 → (450000, 1275000, 1275000)
    val r1 = GraphRank.personalizedRankOn(walk, seed = 1L, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 450000L, 2L -> 1275000L, 3L -> 1275000L),
      s"round 1: $r1")
    // round 2: s(1) = 1275000/2; s(2) = 450000/2 + 1275000/2 = 862500;
    // s(3) = 450000/2 → (450000 + 541875, 733125, 191250)
    val r2 = GraphRank.personalizedRankOn(walk, seed = 1L, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 991875L, 2L -> 733125L, 3L -> 191250L),
      s"round 2: $r2")
    // a seed outside the graph has nowhere to teleport: the all-zero
    // fixed point, not a silent uniform fallback
    val r9 = GraphRank.personalizedRankOn(walk, seed = 99L, iters = 3)
      .collect().map(_.getLong(1)).toSet
    assert(r9 == Set(0L), s"missing-seed ranks: $r9")
  }

  test("personalized rank: both dispatch paths agree on the sf corpus") {
    val a = GraphRank.personalizedRank(spark, sf).collect()
      .map(_.toSeq).toSeq
    val b = GraphRank.personalizedRank(spark, sf, edgeBudget = 0L)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("bfs hops: hand trace with a cycle, a depth bound, and an " +
      "unreachable node; both dispatch paths agree") {
    // directed chain with a back-edge: 0→1→2→3→1 (cycle), plus 9→0
    // (node 9 reaches 0 but 0 never reaches 9 — direction matters)
    val ev = evRows(Seq(
      (7L, 1, 1L, 0L), (7L, 2, 2L, 1L), (7L, 3, 3L, 2L),
      (7L, 4, 4L, 3L), (7L, 5, 5L, 1L),
      (8L, 1, 6L, 9L), (8L, 2, 7L, 0L)))
    def hops(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val want = Seq(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L)
    assert(hops(GraphRank.bfsHopsOn(ev, seed = 0L)) == want)
    // the cycle's revisit of node 1 keeps its FIRST depth; node 9
    // never appears (unreachable by direction)
    assert(hops(GraphRank.bfsHopsOn(ev, seed = 0L, edgeBudget = 0L))
      == want, "distributed frontier loop diverged from driver BFS")
    // depth bound truncates the frontier, both paths
    val short = Seq(0L -> 0L, 1L -> 1L, 2L -> 2L)
    assert(hops(GraphRank.bfsHopsOn(ev, seed = 0L, maxDepth = 2)) == short)
    assert(hops(GraphRank.bfsHopsOn(ev, seed = 0L, maxDepth = 2,
      edgeBudget = 0L)) == short)
    // a seed with no outgoing edges is still reported at distance 0
    assert(hops(GraphRank.bfsHopsOn(ev, seed = 3L, maxDepth = 1))
      == Seq(3L -> 0L, 1L -> 1L))
  }

  test("bfs hops: both dispatch paths agree on the sf corpus") {
    val a = GraphRank.bfsHops(spark, sf).collect().map(_.toSeq).toSeq
    val b = GraphRank.bfsHops(spark, sf, edgeBudget = 0L)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("next items: hand trace with a count tie and the topK cut") {
    // user 7: 1→2, 2→1, 1→2 (w(1→2)=2); user 8: 1→3 (w=1), 3→1;
    // wout(1)=3 → prob(1→2)=666666 ppm, prob(1→3)=333333 ppm
    val ev = evRows(Seq(
      (7L, 1, 1L, 1L), (7L, 2, 2L, 2L), (7L, 3, 3L, 1L),
      (7L, 4, 4L, 2L),
      (8L, 1, 5L, 1L), (8L, 2, 6L, 3L), (8L, 3, 7L, 1L)))
    val got = GraphRank.nextItemsOn(ev, topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 2L, 2L, 666666L, 1L),
      (2L, 1L, 1L, 1000000L, 1L), (3L, 1L, 1L, 1000000L, 1L)),
      s"got $got")
    // topK=2 admits the tied-below successor; equal counts order by dst
    val k2 = GraphRank.nextItemsOn(ev, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .toSeq
    assert(k2 == Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 1L, 1L),
      (3L, 1L, 1L)), s"got $k2")
  }

  test("triangles: shared-edge pair counted once per triangle per corner") {
    // K4 minus edge (3,4): triangles (1,2,3) and (1,2,4); both directed
    // directions of (1,2) collapse to ONE undirected edge
    val got = GraphRank.trianglesOn(evRows(Seq(
        (1L, 1, 1L, 1L), (1L, 2, 2L, 2L),   // 1→2
        (2L, 1, 3L, 2L), (2L, 2, 4L, 1L),   // 2→1 (same undirected edge)
        (3L, 1, 5L, 1L), (3L, 2, 6L, 3L),   // 1–3
        (4L, 1, 7L, 1L), (4L, 2, 8L, 4L),   // 1–4
        (5L, 1, 9L, 2L), (5L, 2, 10L, 3L),  // 2–3
        (6L, 1, 11L, 2L), (6L, 2, 12L, 4L)))) // 2–4
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L), s"got $got")
  }
}
