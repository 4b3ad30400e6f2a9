package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics over the event stream: PageRank on the
  * item-transition graph (per-user consecutive `props.k` transitions,
  * weighted by frequency) — the "what do sessions flow toward"
  * centrality every clickstream warehouse eventually wants, and the
  * engine's generic iterate-join-aggregate shape (the q53 connected-
  * components loop's directed, weighted sibling).
  *
  * All-integer fixed point, exactly replayed by the (unrolled) DuckDB
  * oracle: ranks live in micros, each iteration is
  *   `r'(v) = 150000 + (85 · Σ_{u→v} floor(r(u)·w(u,v) / wout(u))) div 100`
  * (damping 0.85, teleport 0.15·10⁶), so every step is exact Long
  * arithmetic and partial-aggregation order cannot flip a digit.
  * Dangling mass (nodes with no out-edges) is dropped — the documented
  * variant; ranks then need no global renormalization step, which
  * would be the one all-to-one exchange in the plan.
  *
  * Scale shape: the edge relation (with its out-weight joined on once,
  * up front) is `localCheckpoint`ed and reused by every round — each
  * iteration is ONE shuffle join (ranks onto edges by src) plus ONE
  * aggregation (contributions by dst), the canonical distributed
  * PageRank plan; lineage is truncated per round by the checkpoint (a
  * 100 TB run would checkpoint to reliable storage instead, the q53
  * note), and intermediate rank snapshots are released as soon as the
  * next round materializes. Iteration count is FIXED (convergence
  * detection would add a per-round action), which also keeps the
  * result a pure function of the input — the oracle-ability contract.
  */
object GraphRank {

  /** Damping in percent and teleport mass in micros: 0.85 / 0.15. */
  val DampingPct = 85L
  val TeleportMicros = 150000L

  /** Release the storage behind a localCheckpoint'd frame (the Dedup
    * helper's contract: only safe when the frame is never referenced
    * again). */
  private def releaseCheckpoint(df: DataFrame): Unit =
    graft.Caches.releaseCheckpoint(df)

  /** Edge count at or below which [[pageRank]] runs the rank loop on
    * the driver instead of scheduling `iters` join rounds — the q53
    * measured-dispatch contract: the blocks are already materialized,
    * the count is a block scan, and a small graph's 10 scheduled
    * rounds are pure overhead against a millisecond array loop. Same
    * integer arithmetic on both paths, so the oracle cannot tell. */
  val DriverRankEdgeBudget: Long = 2L * 1000 * 1000

  /** q104: PageRank over the `props.k` transition graph of `events`.
    * Output: (node, rank_micros) after `iters` rounds. */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 10,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame =
    pageRankOn(
      // spread the RAW scan: the JSON parse sits above the inserted
      // exchange, so a single-split file parses on every core (no-op
      // on an already-parallel scan — ScanPar.spread)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      iters, edgeBudget)

  /** [[pageRank]] over an explicit (user_id, ts, event_id, k) event
    * relation. Events without a `k` are NOT graph nodes and are
    * dropped up front — ONE rule both dispatch paths share (the
    * distributed join would silently never match a NULL node while
    * the driver path's getLong would silently read it as node 0;
    * neither silent behavior is acceptable). */
  def pageRankOn(ev0: DataFrame, iters: Int = 10,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val (edgesN, nodes) = rankGraph(ev0)
    rankLoop(ev0.sparkSession, edgesN, nodes, iters, edgeBudget)
  }

  /** [[pageRank]] over an explicit weighted edge relation
    * `(src, dst, w)` and node set `(node)` — the entry the streaming
    * twin uses: [[graft.streaming.GraphStream]] accumulates exactly
    * these relations per epoch, and the loop (including the measured
    * [[DriverRankEdgeBudget]] dispatch) is shared with the
    * event-derived path, so both are bit-identical on the same graph.
    * Edges are re-aggregated here (sum of `w` per (src, dst)), so
    * per-epoch partial weights can be fed as-is. */
  def pageRankOnGraph(edges: DataFrame, nodes: DataFrame,
      iters: Int = 10,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.groupBy("src", "dst").agg(sum(col("w")).as("w"))
    val outw = e.groupBy("src").agg(sum(col("w")).as("wout"))
    val edgesN = e.join(outw, Seq("src")).localCheckpoint()
    val n = nodes.select("node").distinct().localCheckpoint()
    rankLoop(edges.sparkSession, edgesN, n, iters, edgeBudget)
  }

  /** q136: PERSONALIZED PageRank — q104's integer walk with ALL
    * teleport mass re-entering at `seed` instead of uniformly
    * (`TeleportMicros · |V|` at the seed — the same total mass, so
    * rank magnitudes stay comparable with q104's): "importance from
    * this item's point of view", the standard seeded random-walk
    * relevance of recommendation graphs. Same shared loop, same
    * measured dispatch, same exact-Long arithmetic; a seed that is
    * not a graph node yields the all-zero fixed point (teleport
    * matches nothing) rather than a silent fallback. */
  def personalizedRank(spark: SparkSession, dir: String, seed: Long = 0L,
      iters: Int = 10,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame =
    personalizedRankOn(
      // spread the RAW scan: the JSON parse sits above the inserted
      // exchange, so a single-split file parses on every core (no-op
      // on an already-parallel scan — ScanPar.spread)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      seed, iters, edgeBudget)

  /** [[personalizedRank]] over an explicit (user_id, ts, event_id, k)
    * event relation. */
  def personalizedRankOn(ev0: DataFrame, seed: Long, iters: Int = 10,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val (edgesN, nodes) = rankGraph(ev0)
    rankLoop(ev0.sparkSession, edgesN, nodes, iters, edgeBudget,
      Some(seed))
  }

  /** [[personalizedRank]] over an explicit weighted edge relation and
    * node set (the streaming twin's entry — the [[pageRankOnGraph]]
    * contract with a seed). */
  def personalizedRankOnGraph(edges: DataFrame, nodes: DataFrame,
      seed: Long, iters: Int = 10,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.groupBy("src", "dst").agg(sum(col("w")).as("w"))
    val outw = e.groupBy("src").agg(sum(col("w")).as("wout"))
    val edgesN = e.join(outw, Seq("src")).localCheckpoint()
    val n = nodes.select("node").distinct().localCheckpoint()
    rankLoop(edges.sparkSession, edgesN, n, iters, edgeBudget, Some(seed))
  }

  /** The shared rank loop (both dispatch paths). Owns — and releases —
    * the materialized `edgesN`/`nodes` relations. `seed = None` is
    * q104's uniform-teleport PageRank; `Some(s)` is the PERSONALIZED
    * variant (q136): all teleport mass — `TeleportMicros · |V|`, the
    * same total the uniform walk distributes — re-enters at the seed,
    * and the walk starts there (`10⁶ · |V|` at the seed, 0 elsewhere),
    * so total mass matches q104's Σ r₀ = 10⁶·|V| and every update
    * stays exact-Long. */
  private def rankLoop(spark: SparkSession, edgesN: DataFrame,
      nodes: DataFrame, iters: Int, edgeBudget: Long,
      seed: Option[Long] = None): DataFrame = {
    // |V| is only consumed by the SEEDED teleport (initial mass and
    // per-round re-entry); counting it unconditionally charged every
    // uniform q104/q124 call — including the driver-dispatch path — an
    // extra distributed job (round-13 verdict #1)
    val nNodes = if (seed.isDefined) nodes.count() else 0L
    if (edgesN.count() <= edgeBudget) {
      val out = driverRank(spark, edgesN, nodes, iters, seed)
      releaseCheckpoint(edgesN)
      releaseCheckpoint(nodes)
      return out
    }
    val r0 = seed match {
      case None => nodes.withColumn("r", lit(1000000L))
      case Some(s) => nodes.withColumn("r",
        when(col("node") === s, lit(1000000L * nNodes))
          .otherwise(lit(0L)))
    }
    var ranks = r0.localCheckpoint()
    var round = 0
    while (round < iters) {
      val next = rankStep(edgesN, nodes, ranks, seed, nNodes)
        .localCheckpoint()
      releaseCheckpoint(ranks)
      ranks = next
      round += 1
    }
    val out = ranks.select(col("node"), col("r").as("rank_micros"))
      .orderBy("node")
    releaseCheckpoint(edgesN)
    releaseCheckpoint(nodes)
    out
  }

  /** The static rank-loop relations: weighted edges with the source's
    * total out-weight riding along, and the node set — both
    * materialized ONCE with lineage cut (each iteration joins a
    * block-backed relation), released by the caller.
    *
    * The k-projection itself materializes FIRST: the edge window and
    * the node distinct both read it, and without the checkpoint each
    * re-runs the source scan + the `get_json_object` parse — measured
    * 9 s of the 22 s q104 graph build at sf1 was the second parse.
    * The projection's blocks release as soon as both derived
    * relations exist. */
  private def rankGraph(ev0: DataFrame): (DataFrame, DataFrame) = {
    val ev = ev0.where(col("k").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("k"))
      .localCheckpoint()
    val nxt = lead(col("k"), 1).over(
      Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
    val trans = ev.select(col("k").as("src"), nxt.as("dst"))
      .where(col("dst").isNotNull)
    val edges = trans.groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val outw = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    val edgesN = edges.join(outw, Seq("src")).localCheckpoint()
    val nodes = ev.select(col("k").as("node")).distinct()
      .localCheckpoint()
    releaseCheckpoint(ev)
    (edgesN, nodes)
  }

  /** ONE synchronous rank round (lazy): contributions in, damped
    * teleport out — the exact integer arithmetic both dispatch paths
    * and the unrolled oracle replay. Uniform teleport for q104;
    * seed-concentrated (`TeleportMicros · |V|` at the seed, 0
    * elsewhere) for the personalized walk. */
  private def rankStep(edgesN: DataFrame, nodes: DataFrame,
      ranks: DataFrame, seed: Option[Long] = None,
      nNodes: Long = 0L): DataFrame = {
    val contrib = edgesN
      .join(ranks, edgesN("src") === ranks("node"))
      .select(col("dst").as("node"), expr("(r * w) div wout").as("c"))
      .groupBy("node").agg(sum(col("c")).as("s"))
    val teleport = seed match {
      case None => lit(TeleportMicros)
      case Some(s) => when(col("node") === s,
        lit(TeleportMicros * nNodes)).otherwise(lit(0L))
    }
    nodes.join(contrib, Seq("node"), "left")
      .select(col("node"),
        (teleport +
          expr(s"($DampingPct * coalesce(s, 0L)) div 100")).as("r"))
  }

  /** q124: PageRank CONVERGENCE diagnostic — per round, the L1
    * distance Σ|r_i − r_{i−1}| (micros) and the count of nodes whose
    * rank moved, round 1 measured against the uniform 10⁶-micros
    * start. At 100 TB "did my 10 fixed rounds actually converge" is
    * the first question a user asks of the iterative family
    * (round-10 verdict #6); this emits the answer as a relation while
    * [[pageRank]] keeps its fixed-iteration pure-function contract
    * (the oracle-ability rule — convergence detection inside the loop
    * would make the result depend on a per-round action anyway, which
    * the loop already pays for materialization, so the diagnostic is
    * ~free: ONE node-keyed join + one 1-row aggregate per round).
    *
    * Both dispatch paths ([[DriverRankEdgeBudget]]) produce
    * bit-identical rows — exact Long arithmetic, order-free sums. */
  def pageRankConvergence(spark: SparkSession, dir: String,
      iters: Int = 10,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame =
    pageRankConvergenceOn(
      // spread the RAW scan: the JSON parse sits above the inserted
      // exchange, so a single-split file parses on every core (no-op
      // on an already-parallel scan — ScanPar.spread)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      iters, edgeBudget)

  /** [[pageRankConvergence]] over an explicit event relation. */
  def pageRankConvergenceOn(ev0: DataFrame, iters: Int = 10,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = ev0.sparkSession
    import spark.implicits._
    val (edgesN, nodes) = rankGraph(ev0)
    val rows =
      if (edgesN.count() <= edgeBudget)
        driverRankTrace(edgesN, nodes, iters)
      else {
        var ranks = nodes.withColumn("r", lit(1000000L)).localCheckpoint()
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var round = 1
        while (round <= iters) {
          val next = rankStep(edgesN, nodes, ranks).localCheckpoint()
          val d = next
            .join(ranks.select(col("node"), col("r").as("rp")), "node")
            .agg(sum(abs(col("r") - col("rp"))).as("l1"),
              sum(when(col("r") =!= col("rp"), 1L).otherwise(0L)).as("mv"))
            .collect()(0) // 1 row per round — bounded driver traffic
          buf += ((round.toLong, d.getLong(0), d.getLong(1)))
          releaseCheckpoint(ranks)
          ranks = next
          round += 1
        }
        releaseCheckpoint(ranks)
        buf.toSeq
      }
    releaseCheckpoint(edgesN)
    releaseCheckpoint(nodes)
    rows.toDF("round", "l1_delta_micros", "moved_nodes").orderBy("round")
  }

  /** The driver-dispatch twin of the distributed convergence loop —
    * the [[driverRank]] arithmetic with the per-round diff folded in. */
  private def driverRankTrace(edgesN: DataFrame, nodes: DataFrame,
      iters: Int): Seq[(Long, Long, Long)] = {
    val (ns, src, dst, w, wout) = rankArrays(edgesN, nodes)
    var r = Array.fill(ns.length)(1000000L)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var round = 1
    while (round <= iters) {
      val next = rankRound(r, src, dst, w, wout)
      var l1 = 0L; var moved = 0L; var i = 0
      while (i < ns.length) {
        if (next(i) != r(i)) { l1 += math.abs(next(i) - r(i)); moved += 1 }
        i += 1
      }
      buf += ((round.toLong, l1, moved))
      r = next
      round += 1
    }
    buf.toSeq
  }

  /** q125: label-propagation convergence — per round, how many nodes
    * FLIPPED label and how many distinct communities remain. The
    * [[pageRankConvergence]] rationale, for [[labelPropagation]]:
    * "are 5 rounds enough / is it oscillating" read off a relation
    * (a 2-cycle's steady oscillation shows as flips that never reach
    * zero — the known synchronous-LPA behavior, spec-pinned). */
  def labelPropagationConvergence(spark: SparkSession, dir: String,
      iters: Int = 5,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame =
    labelPropagationConvergenceOn(
      // spread the RAW scan: the JSON parse sits above the inserted
      // exchange, so a single-split file parses on every core (no-op
      // on an already-parallel scan — ScanPar.spread)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      iters, edgeBudget)

  /** [[labelPropagationConvergence]] over an explicit event relation. */
  def labelPropagationConvergenceOn(ev0: DataFrame, iters: Int = 5,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = ev0.sparkSession
    import spark.implicits._
    val und = undirectedEdges(ev0)
    val sym = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    val nEdges = sym.count()
    releaseCheckpoint(und)
    val rows =
      if (nEdges <= edgeBudget)
        driverLpaTrace(sym, iters)
      else {
        var labels = sym.select(col("u").as("node")).distinct()
          .withColumn("lbl", col("node"))
          .localCheckpoint()
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var round = 1
        while (round <= iters) {
          val next = lpaStep(sym, labels).localCheckpoint()
          val d = next
            .join(labels.select(col("node"), col("lbl").as("lp")), "node")
            .agg(sum(when(col("lbl") =!= col("lp"), 1L).otherwise(0L))
                .as("flips"),
              countDistinct(col("lbl")).as("ncomm"))
            .collect()(0)
          buf += ((round.toLong, d.getLong(0), d.getLong(1)))
          releaseCheckpoint(labels)
          labels = next
          round += 1
        }
        releaseCheckpoint(labels)
        buf.toSeq
      }
    releaseCheckpoint(sym)
    rows.toDF("round", "flips", "n_communities").orderBy("round")
  }

  /** CSR carrier for the driver LPA loop: nodes = distinct symmetric-
    * edge sources (every endpoint appears as a source — sym carries
    * both directions), neighbor lists as one flat index array. The
    * boxed groupBy-per-node formulation paid per-round Map rebuilds
    * at the edge-budget ceiling; this is the same rule on primitives. */
  private def lpaArrays(sym: DataFrame)
      : (Array[Long], Array[Int], Array[Int]) = {
    val rows = sym.select("u", "v").collect()
    val ns = rows.map(_.getLong(0)).distinct.sorted
    val idx = new java.util.HashMap[java.lang.Long, Integer](ns.length * 2)
    var i = 0
    while (i < ns.length) { idx.put(ns(i), i); i += 1 }
    val off = new Array[Int](ns.length + 1)
    rows.foreach(r => off(idx.get(r.getLong(0)).intValue() + 1) += 1)
    i = 0
    while (i < ns.length) { off(i + 1) += off(i); i += 1 }
    val cur = off.clone()
    val nbr = new Array[Int](rows.length)
    rows.foreach { r =>
      val u = idx.get(r.getLong(0)).intValue()
      nbr(cur(u)) = idx.get(r.getLong(1)).intValue()
      cur(u) += 1
    }
    (ns, off, nbr)
  }

  /** ONE driver LPA round — the [[lpaStep]] rule verbatim: most
    * frequent neighbor label, ties to the smallest. */
  private def lpaRound(ns: Array[Long], off: Array[Int], nbr: Array[Int],
      lbl: Array[Long]): Array[Long] = {
    val out = new Array[Long](ns.length)
    val counts = new java.util.HashMap[java.lang.Long, Integer]()
    var u = 0
    while (u < ns.length) {
      counts.clear()
      var j = off(u)
      while (j < off(u + 1)) {
        val l: java.lang.Long = lbl(nbr(j))
        val c = counts.get(l)
        counts.put(l, if (c == null) 1 else c.intValue() + 1)
        j += 1
      }
      var bestL = Long.MaxValue; var bestC = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.intValue(); val l = e.getKey.longValue()
        if (c > bestC || (c == bestC && l < bestL)) { bestC = c; bestL = l }
      }
      out(u) = bestL
      u += 1
    }
    out
  }

  /** Driver-dispatch twin of the distributed LPA convergence loop
    * (the [[driverLpa]] arithmetic + per-round diff). */
  private def driverLpaTrace(sym: DataFrame, iters: Int)
      : Seq[(Long, Long, Long)] = {
    val (ns, off, nbr) = lpaArrays(sym)
    var lbl = ns.clone()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    (1 to iters).foreach { i =>
      val next = lpaRound(ns, off, nbr, lbl)
      var flips = 0L
      val set = new java.util.HashSet[java.lang.Long]()
      var k = 0
      while (k < ns.length) {
        if (next(k) != lbl(k)) flips += 1
        set.add(next(k)); k += 1
      }
      buf += ((i.toLong, flips, set.size.toLong))
      lbl = next
    }
    buf.toSeq
  }

  /** q119: per-node triangle counts on the UNDIRECTED item-transition
    * graph (same graph as [[pageRank]], direction and weights dropped,
    * self-loops removed) — the local-clustering signal of graph
    * analytics, and the canonical "curse of the last reducer" problem.
    *
    * Algorithm: degree-ordered edge orientation (Suri–Vassilvitskii;
    * public literature): every edge points from its lower-(degree, id)
    * endpoint to the higher, so each triangle is found EXACTLY ONCE as
    * an oriented wedge (u→v, u→w, v<w in orientation order) closed by
    * the oriented edge v→w — and the wedge count is bounded by
    * Σ outdeg², which orientation keeps O(m·√m) worst-case instead of
    * Σ deg² (a celebrity node's fans never form wedges AT the
    * celebrity). Output: (node, degree, triangles), all integers.
    *
    * Scale shape: one distinct for the undirected edge set, one degree
    * aggregation (node-sized, AQE-broadcastable onto the edges), the
    * wedge self-join on the oriented source, and the closing equi-join
    * on (v, w) — every join keyed, nothing cartesian, counts exact
    * Longs. */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    trianglesOn(
      // spread the RAW scan: the JSON parse sits above the inserted
      // exchange, so a single-split file parses on every core (no-op
      // on an already-parallel scan — ScanPar.spread)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")))

  /** The undirected simple item graph both [[triangles]] and
    * [[labelPropagation]] analyze: distinct per-user consecutive-k
    * transitions, direction and self-loops dropped, (a < b) normalized. */
  private def undirectedEdges(ev0: DataFrame): DataFrame =
    // materialize with lineage CUT: the LPA loop below reads this
    // relation 2–3× (sym union branches) and then re-derives labels
    // from sym round after round — the eager localCheckpoint is
    // released explicitly once sym materializes
    undirectedEdgesPlan(ev0).localCheckpoint()

  /** The lazy undirected-edge plan [[undirectedEdges]] checkpoints:
    * distinct per-user consecutive-k transitions, (a < b) normalized. */
  private def undirectedEdgesPlan(ev0: DataFrame): DataFrame = {
    val ev = ev0.where(col("k").isNotNull)
    val nxt = lead(col("k"), 1).over(
      Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
    ev.select(col("k").as("src"), nxt.as("dst"))
      .where(col("dst").isNotNull && col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
  }

  /** [[triangles]] over an explicit (user_id, ts, event_id, k) event
    * relation (k-less events dropped, the [[pageRankOn]] rule). */
  def trianglesOn(ev0: DataFrame): DataFrame = {
    // CACHE, not localCheckpoint: the edge set is read 2–3× within one
    // execution (degree agg + orientation join), but unlike the loop
    // operators nothing here can release it before the caller actions
    // the returned lazy frame — a registered cache is host-released
    // (Caches.releaseAll) and recompute-safe, where an unreleased
    // checkpoint would pin its blocks until RDD GC (round-10 advice)
    val und = graft.Caches.register(undirectedEdgesPlan(ev0).cache())
    // deg is read three times (two orientation joins + the final left
    // join) and o three times (e1/e2/e3): cache both carriers, or each
    // alias recomputes the whole upstream — 29 exchanges uncached vs 10
    val deg = graft.Caches.register(
      und.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("degree"))
        .cache())
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // o carries the HEAD's degree (dv): the wedge pair below must order
    // its two endpoints in the SAME (degree, id) total order the
    // orientation uses — ordering by id alone misses every triangle
    // whose closing edge has inverted degree order (caught by the
    // brute-force property test)
    val o = graft.Caches.register(
      withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("db")).otherwise(col("da")).as("dv"))
        .cache())
    val e1 = o.as("e1"); val e2 = o.as("e2"); val e3 = o.as("e3")
    val tri = e1.join(e2,
        col("e1.u") === col("e2.u") &&
          (col("e1.dv") < col("e2.dv") ||
            (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("x"), col("e1.v").as("y"),
        col("e2.v").as("z"))
      .join(e3, col("y") === col("e3.u") && col("z") === col("e3.v"))
      .select("x", "y", "z")
    val corners = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .orderBy("node")
  }

  /** q121: community detection by SYNCHRONOUS label propagation
    * (Raghavan et al., public literature) on the undirected item graph
    * — `iters` fixed rounds of "adopt the most frequent label among
    * your neighbors", every choice deterministic (ties break toward the
    * SMALLEST label; synchronous update = a pure function of the
    * previous round, which is the oracle-ability contract — the
    * asynchronous variant's result depends on visit order). Labels
    * start as the node's own id; every node of the edge set has ≥1
    * neighbor by construction, so no keep-own fallback is reachable.
    *
    * Scale shape: the q104 loop discipline — the symmetric edge list
    * materializes once (localCheckpoint), each round is ONE join
    * (labels onto edge heads) + ONE two-level aggregation (label
    * counts, then the (−cnt, lbl) struct-min argmax) behind
    * checkpoint-truncated lineage. Output: (node, label), where equal
    * labels = one community. */
  def labelPropagation(spark: SparkSession, dir: String,
      iters: Int = 5,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame =
    labelPropagationOn(
      // spread the RAW scan: the JSON parse sits above the inserted
      // exchange, so a single-split file parses on every core (no-op
      // on an already-parallel scan — ScanPar.spread)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      iters, edgeBudget)

  /** [[labelPropagation]] over an explicit (user_id, ts, event_id, k)
    * event relation. */
  def labelPropagationOn(ev0: DataFrame, iters: Int = 5,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    lpaLoop(ev0.sparkSession, undirectedEdges(ev0), iters, edgeBudget)
  }

  /** [[labelPropagation]] over an explicit directed edge relation
    * `(src, dst, …)` — the streaming twin's entry
    * ([[pageRankOnGraph]]'s rationale): the undirected simple graph
    * derives here exactly as [[undirectedEdgesPlan]] derives it from
    * transitions (self-loops dropped, (a < b) normalized, distinct),
    * and the loop + tie rules are shared, so batch and accumulated
    * paths are bit-identical on the same edge set. Weights are
    * ignored, as in the batch operator. */
  def labelPropagationOnGraph(edges: DataFrame, iters: Int = 5,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint()
    lpaLoop(edges.sparkSession, und, iters, edgeBudget)
  }

  /** The shared LPA loop (both dispatch paths). Owns — and releases —
    * the materialized undirected edge relation. */
  private def lpaLoop(spark: SparkSession, und: DataFrame, iters: Int,
      edgeBudget: Long): DataFrame = {
    val sym = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    // the q104 measured dispatch: a small graph's scheduled rounds are
    // pure overhead against a driver loop with identical tie rules
    // (spec-pinned equal) — 12 s → ~1 s at sf1
    val nEdges = sym.count() // also materializes sym: und is now dead
    releaseCheckpoint(und)
    if (nEdges <= edgeBudget) {
      val out = driverLpa(spark, sym, iters)
      releaseCheckpoint(sym)
      return out
    }
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    var round = 0
    while (round < iters) {
      val next = lpaStep(sym, labels).localCheckpoint()
      releaseCheckpoint(labels)
      labels = next
      round += 1
    }
    val out = labels.select(col("node"), col("lbl").as("label"))
      .orderBy("node")
    releaseCheckpoint(sym)
    out
  }

  /** ONE synchronous label-propagation round (lazy): most-frequent
    * neighbor label, ties to the smallest — the (−cnt, lbl) struct-min
    * argmax all paths and the unrolled oracle share. */
  private def lpaStep(sym: DataFrame, labels: DataFrame): DataFrame =
    sym
      .join(labels, sym("v") === labels("node"))
      .select(col("u"), col("lbl"))
      .groupBy("u", "lbl").agg(count(lit(1)).as("cnt"))
      .groupBy("u")
      .agg(min(struct((-col("cnt")).as("negCnt"), col("lbl").as("l")))
        .as("m"))
      .select(col("u").as("node"), col("m.l").as("lbl"))

  /** The same synchronous update as the distributed loop, on collected
    * arrays — identical by construction (exact counts, the same
    * (−cnt, lbl) tie order). */
  private def driverLpa(spark: SparkSession, sym: DataFrame,
      iters: Int): DataFrame = {
    import spark.implicits._
    val (ns, off, nbr) = lpaArrays(sym)
    var lbl = ns.clone()
    (1 to iters).foreach(_ => lbl = lpaRound(ns, off, nbr, lbl))
    ns.indices.map(i => (ns(i), lbl(i))).toDF("node", "label")
  }

  /** Dense-index carrier for the driver rank loop: node ids interned
    * to array positions, edges as parallel primitive arrays. The
    * boxed-Map formulation rebuilt a 1M-entry immutable Map per round
    * at the edge-budget ceiling (measured 12.2 s at sf1); the array
    * sweep is the same exact Long arithmetic (integer sums are
    * order-free) at a fraction of the driver time. */
  private def rankArrays(edgesN: DataFrame, nodes: DataFrame)
      : (Array[Long], Array[Int], Array[Int], Array[Long], Array[Long]) = {
    val ns = nodes.select("node").collect().map(_.getLong(0))
    val idx = new java.util.HashMap[java.lang.Long, Integer](ns.length * 2)
    var i = 0
    while (i < ns.length) { idx.put(ns(i), i); i += 1 }
    val rows = edgesN.select("src", "dst", "w", "wout").collect()
    val src = new Array[Int](rows.length)
    val dst = new Array[Int](rows.length)
    val w = new Array[Long](rows.length)
    val wout = new Array[Long](rows.length)
    var j = 0
    while (j < rows.length) {
      val r = rows(j)
      src(j) = idx.get(r.getLong(0)).intValue()
      dst(j) = idx.get(r.getLong(1)).intValue()
      w(j) = r.getLong(2); wout(j) = r.getLong(3)
      j += 1
    }
    (ns, src, dst, w, wout)
  }

  /** ONE driver rank round over the dense arrays — the [[rankStep]]
    * arithmetic verbatim (`uniform` = q104's teleport; otherwise all
    * teleport mass at `seedIdx`, none anywhere when the seed is not a
    * graph node — exactly the distributed `when(node === s)`). */
  private def rankRound(r: Array[Long], src: Array[Int], dst: Array[Int],
      w: Array[Long], wout: Array[Long], uniform: Boolean = true,
      seedIdx: Int = -1): Array[Long] = {
    val s = new Array[Long](r.length)
    var j = 0
    while (j < src.length) {
      s(dst(j)) += r(src(j)) * w(j) / wout(j); j += 1
    }
    val out = new Array[Long](r.length)
    var i = 0
    while (i < r.length) {
      val tp =
        if (uniform) TeleportMicros
        else if (i == seedIdx) TeleportMicros * r.length else 0L
      out(i) = tp + DampingPct * s(i) / 100L; i += 1
    }
    out
  }

  /** The same integer update as the distributed loop, on collected
    * arrays — bit-identical by construction (exact Long arithmetic,
    * order-free sums). */
  private def driverRank(spark: SparkSession, edgesN: DataFrame,
      nodes: DataFrame, iters: Int,
      seed: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val (ns, src, dst, w, wout) = rankArrays(edgesN, nodes)
    val seedIdx = seed.map(s => ns.indexOf(s)).getOrElse(-1)
    var r = seed match {
      case None => Array.fill(ns.length)(1000000L)
      case Some(_) =>
        Array.tabulate(ns.length)(i =>
          if (i == seedIdx) 1000000L * ns.length else 0L)
    }
    var round = 0
    while (round < iters) {
      r = rankRound(r, src, dst, w, wout, uniform = seed.isEmpty, seedIdx)
      round += 1
    }
    ns.indices.map(i => (ns(i), r(i))).sortBy(_._1)
      .toDF("node", "rank_micros")
  }

  // ---- q134: BFS hop distances -----------------------------------

  /** q134: multi-hop reachability — BFS hop distance from `seed` over
    * the DIRECTED `props.k` transition graph of `events`, bounded at
    * `maxDepth`. Output: (node, dist) for every node FIRST reachable
    * within `maxDepth` hops (the seed itself at 0), ordered
    * (dist, node). The "how far is everything from this item" query
    * of catalog navigation — and the one classic distributed-graph
    * shape (frontier expansion) the family lacked next to PageRank,
    * LPA, and triangles.
    *
    * Scale shape: the textbook frontier loop — per round ONE keyed
    * equi-join frontier⋈edges plus one anti-join against the settled
    * set, both on item keys; the frontier is VOCABULARY-bounded,
    * never event-bounded (the event log is touched once, to build the
    * distinct edge set), and the loop stops as soon as a round
    * discovers nothing. Small graphs dispatch to a driver adjacency
    * BFS under the measured [[DriverRankEdgeBudget]] (the q104 rule;
    * identical integers on both paths — spec-pinned). */
  def bfsHops(spark: SparkSession, dir: String, seed: Long = 0L,
      maxDepth: Int = 6,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame =
    bfsHopsOn(
      // spread the RAW scan: the JSON parse sits above the inserted
      // exchange, so a single-split file parses on every core (no-op
      // on an already-parallel scan — ScanPar.spread)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      seed, maxDepth, edgeBudget)

  /** [[bfsHops]] over an explicit (user_id, ts, event_id, k) event
    * relation (k-less events dropped — the [[pageRankOn]] rule). */
  def bfsHopsOn(ev0: DataFrame, seed: Long, maxDepth: Int = 6,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val ev = ev0.where(col("k").isNotNull)
    val nxt = lead(col("k"), 1).over(
      Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
    val edges = ev.select(col("k").as("src"), nxt.as("dst"))
      .where(col("dst").isNotNull)
      .select("src", "dst").distinct().localCheckpoint()
    bfsLoop(ev0.sparkSession, edges, seed, maxDepth, edgeBudget)
  }

  /** [[bfsHops]] over an explicit (src, dst[, w]) edge relation — the
    * streaming twin's entry ([[graft.streaming.GraphStream]]
    * accumulates per-epoch edge partials; reachability only needs the
    * distinct arcs). Shared loop → bit-identical to the event path. */
  def bfsHopsOnGraph(edges: DataFrame, seed: Long, maxDepth: Int = 6,
      edgeBudget: Long = DriverRankEdgeBudget): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val e = edges.select("src", "dst").distinct().localCheckpoint()
    bfsLoop(edges.sparkSession, e, seed, maxDepth, edgeBudget)
  }

  /** The shared BFS (both dispatch paths). Owns — and releases — the
    * materialized distinct-edge relation. */
  private def bfsLoop(spark: SparkSession, edges: DataFrame, seed: Long,
      maxDepth: Int, edgeBudget: Long): DataFrame = {
    import spark.implicits._
    if (edges.count() <= edgeBudget) {
      val out = driverBfs(spark, edges, seed, maxDepth)
      releaseCheckpoint(edges)
      return out
    }
    var settled = Seq((seed, 0L)).toDF("node", "dist").localCheckpoint()
    var frontier = settled
    var depth = 1
    var done = false
    while (depth <= maxDepth && !done) {
      val nxt = frontier.join(edges, frontier("node") === edges("src"))
        .select(edges("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .select(col("node"), lit(depth.toLong).as("dist"))
        .localCheckpoint()
      if (nxt.count() == 0L) { releaseCheckpoint(nxt); done = true }
      else {
        val merged = settled.unionByName(nxt).localCheckpoint()
        if (!(frontier eq settled)) releaseCheckpoint(frontier)
        releaseCheckpoint(settled)
        settled = merged
        frontier = nxt
        depth += 1
      }
    }
    if (!(frontier eq settled)) releaseCheckpoint(frontier)
    releaseCheckpoint(edges)
    settled.orderBy("dist", "node")
  }

  /** Driver-side adjacency BFS — first-discovery depth is exactly the
    * distributed loop's min depth (both are level-synchronous). */
  private def driverBfs(spark: SparkSession, edges: DataFrame,
      seed: Long, maxDepth: Int): DataFrame = {
    import spark.implicits._
    val adj = edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, es) => (s, es.map(_._2)) }
    val dist = scala.collection.mutable.HashMap(seed -> 0L)
    var frontier: Seq[Long] = Seq(seed)
    var d = 1L
    while (frontier.nonEmpty && d <= maxDepth) {
      frontier = frontier
        .flatMap(n => adj.getOrElse(n, Array.empty[Long]))
        .distinct.filterNot(dist.contains)
      frontier.foreach(n => dist(n) = d)
      d += 1
    }
    dist.toSeq.toDF("node", "dist").orderBy("dist", "node")
  }

  // ---- q135: next-item transition table ---------------------------

  /** q135: next-item recommendation table — for each source item the
    * top-`topK` successors by transition count, with the EXACT
    * integer conditional probability `prob_ppm = (w·10⁶) div wout`
    * and a deterministic rank (count desc, dst asc). The Markov-chain
    * reading of the q104 edge relation: "users who engaged k=X next
    * engaged …", served as a relation.
    *
    * Scale shape: the q104 edge aggregation (vocabulary-bounded, the
    * event log read once) + ONE window partitioned by src — no
    * iteration, no driver dispatch, nothing floating on the ranking
    * boundary. */
  def nextItems(spark: SparkSession, dir: String,
      topK: Int = 3): DataFrame =
    nextItemsOn(
      // spread the RAW scan: the JSON parse sits above the inserted
      // exchange, so a single-split file parses on every core (no-op
      // on an already-parallel scan — ScanPar.spread)
      ScanPar.spread(Tables.events(spark, dir))
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      topK)

  /** [[nextItems]] over an explicit (user_id, ts, event_id, k) event
    * relation. */
  def nextItemsOn(ev0: DataFrame, topK: Int = 3): DataFrame = {
    val ev = ev0.where(col("k").isNotNull)
    val nxt = lead(col("k"), 1).over(
      Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")))
    val edges = ev.select(col("k").as("src"), nxt.as("dst"))
      .where(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    nextItemsCore(edges, topK)
  }

  /** [[nextItems]] over an explicit (src, dst, w) edge relation (the
    * streaming twin's entry; per-epoch partials re-aggregated). */
  def nextItemsOnGraph(edges: DataFrame, topK: Int = 3): DataFrame =
    nextItemsCore(
      edges.groupBy("src", "dst").agg(sum(col("w")).as("w")), topK)

  private def nextItemsCore(edges0: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    // the vocab-bounded edge carrier feeds BOTH the out-weight agg and
    // the scoring join — cache it so the event-log window+agg runs
    // once, not per branch (the minhashLshPairs carrier rule)
    val edges = graft.Caches.register(edges0.cache())
    val outw = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    edges.join(outw, Seq("src"))
      .select(col("src"), col("dst"), col("w"),
        expr("(w * 1000000L) div wout").as("prob_ppm"),
        row_number().over(Window.partitionBy("src")
          .orderBy(col("w").desc, col("dst"))).cast("long").as("rnk"))
      .where(col("rnk") <= topK)
      .orderBy("src", "rnk")
  }
}
