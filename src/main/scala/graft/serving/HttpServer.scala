package graft.serving

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer => JdkServer}
import java.net.InetSocketAddress
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Api

/** Thin REST wrapper over the Api query programs — the reference's
  * InsightAnalytics surface (/root/reference InsightAnalytics
  * .../controller/PublisherController.java:21-51) without Spring: the
  * JDK built-in HTTP server (zero extra dependencies) dispatching to
  * the same three endpoints and returning JSON rows.
  *
  *   GET /dauRealtime?td=2024-01-15
  *   GET /statsByItem?itemName=small+ring&date=...&t=segment
  *   GET /detailByItem?date=...&itemName=small+ring&pageNo=1&pageSize=20
  *   GET /annSearch?vecId=0&k=10&nprobe=3   (extension: IVF ANN service)
  *   GET /rerankSearch?vecId=0&k=10&coarseDims=16&shortlist=50
  *       (extension: two-stage coarse-shortlist / exact-re-rank)
  *   GET /searchRanked?q=spark+vector&topN=20
  *       (extension: BM25 relevance-ordered document search — the
  *       engine-native form of the reference's ES score ordering)
  *   GET /fuzzySearch?q=goldenrod+lavender+spring&dist=2&topN=20
  *       (extension: typo-tolerant item lookup — ES match+fuzziness)
  *   GET /docTakedown?ids=45,48&probe=7&view=scan|pack|report
  *       (q161/q162/q165: document-corpus right-to-erasure;
  *       cascade=1 expands the seeds through their near-dup clusters,
  *       view=expansion reports the cascade, and source=table answers
  *       the expansion from the stream-maintained cluster table —
  *       q168's point read — instead of the per-call recompute)
  *   GET /timeTravel?version=1&keys=7,42   (lineage as-of lookup; 410
  *       when the version expired)  /lineage  /vacuumLayouts?keepLast=1
  *   GET /rebuildUserSketches   (erasure completion for the sketch
  *       warehouse: user-keyed register tables rebuilt from events)
  *   GET /rebuildBasket  /rebuildGraph   (erasure completion for the
  *       behavioral stores: basket pairs / graph edges+nodes rebuilt
  *       from the retained events)
  *   GET /mediaTakedown?ids=1,2   (erasure for the stream-maintained
  *       dHash signature table — derived personal data)
  *   GET /clusterTakedown?ids=1,2  /clusterAssignment[?ids=1]
  *       (erasure + serving for the stream-maintained near-dup
  *       cluster table: q169's in-place survivor re-derivation and
  *       q168's assignment / cascade-expansion point read)
  *   GET /funnel?steps=view,click,purchase        (q105)
  *   GET /anomalies?windowHours=24&minWindow=12&k=3&dense=0|1 (q120/q123)
  *   GET /paths?len=3&topN=50                     (q122)
  *   GET /communities?iters=5                     (q121)
  *   GET /convergence?algo=pagerank|lpa&iters=10  (q124/q125)
  *
  * The Spark driver hosts the server; each request compiles to a
  * DataFrame program that Catalyst plans and the cluster executes —
  * query serving is the engine itself, not a copy of the data.
  */
class HttpServer(spark: SparkSession, dataDir: String, port: Int = 0,
    sketchDir: Option[String] = None) {

  /** The accumulated sketch-sink directory (`SketchStream.hllSinkEachBatch`
    * / `histSinkEachBatch` output) this server may serve estimates from —
    * server-configured, never caller-supplied (an HTTP param naming an
    * arbitrary filesystem path would be a read gadget). */
  private def sketchDirOr400: String = sketchDir.getOrElse(
    throw new IllegalArgumentException(
      "source=sketch needs a sketch directory configured on this server"))

  private val server = JdkServer.create(new InetSocketAddress(port), 0)

  /** At most ONE erasure (copy-on-write layout rewrite) builds at a
    * time on this serving JVM; concurrent /forget requests for a not-
    * yet-memoized batch get 503 instead of queueing I/O storms. */
  private val forgetGate = new java.util.concurrent.Semaphore(1)

  /** Actual bound port (useful with port=0 → ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Serving responses are driver-side by design (the reference returned
    * ES hits through Spring the same way), but every endpoint is already
    * bounded (24 hour rows / group count / pageSize) — the defensive
    * limit turns "someone adds an unbounded endpoint" into a truncated
    * response instead of a driver OOM. */
  private val MaxRows = 10000

  private def asJson(df: DataFrame): String =
    df.limit(MaxRows).toJSON.collect().mkString("[", ",", "]")

  /** JSON string escaping for error bodies: quotes, backslashes, and
    * control chars — a NumberFormatException message contains quotes and
    * would otherwise yield malformed JSON. */
  private def jsonEscape(s: String): String =
    Option(s).getOrElse("").flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  /** A request that would start an expensive build while another is in
    * flight (or too soon after the last) → HTTP 503, retry later. */
  private final class BusyException(msg: String)
    extends RuntimeException(msg)

  /** Load-shed an erasure/takedown build: a memoized repeat answers
    * immediately; otherwise at most one build proceeds, the rest 503.
    * This gate is UX-level only — build mutual exclusion itself is
    * owned by `Layouts.withBuildGate` inside the operators (round-15
    * advice: the memoized check here is inherently check-then-act). */
  private def gatedBuild[A](memoized: => Boolean)(run: => A): A =
    if (memoized) run
    else if (!forgetGate.tryAcquire())
      throw new BusyException(
        "an erasure build is already in flight; retry later")
    else try run finally forgetGate.release()

  /** Comma-separated long list param; malformed entries → 400. */
  private def longsParam(p: Map[String, String], name: String): Seq[Long] =
    p.getOrElse(name, "").split(",").toSeq
      .map(_.trim).filter(_.nonEmpty).map { s =>
        try s.toLong catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"bad $name '$s'")
        }
      }.distinct

  private def handler(fn: Map[String, String] => DataFrame): HttpHandler =
    (ex: HttpExchange) =>
      try respond(ex, 200, asJson(fn(params(ex))))
      catch {
        // a time-travel read of a vacuum-expired snapshot → 410 Gone:
        // the version existed and was reclaimed by retention — a
        // different contract than a malformed request
        case e: graft.operators.Layouts.VersionExpired =>
          respond(ex, 410, s"""{"error":"${jsonEscape(e.getMessage)}"}""")
        // NumberFormatException (malformed pageNo/pageSize) is an
        // IllegalArgumentException: both are the caller's fault → 400
        case e: IllegalArgumentException =>
          respond(ex, 400, s"""{"error":"${jsonEscape(e.getMessage)}"}""")
        case e: BusyException =>
          respond(ex, 503, s"""{"error":"${jsonEscape(e.getMessage)}"}""")
        case e: Throwable =>
          respond(ex, 500,
            s"""{"error":"${jsonEscape(e.getClass.getSimpleName)}"}""")
      }
      // release operator-internal cached carriers whether the request
      // succeeded or failed — a long-lived server must not accrete query
      // caches (failing requests register carriers too). Try: a release
      // failure must not re-touch the already-closed exchange.
      finally scala.util.Try(graft.Caches.releaseAll())

  def start(): HttpServer = {
    server.createContext("/dauRealtime", handler { p =>
      Api.dauRealtime(spark, dataDir, p.getOrElse("td",
        throw new IllegalArgumentException("td required")))
    })
    server.createContext("/statsByItem", handler { p =>
      Api.statsByItem(spark, dataDir,
        p.getOrElse("itemName",
          throw new IllegalArgumentException("itemName required")),
        p.getOrElse("t", "segment"))
    })
    server.createContext("/detailByItem", handler { p =>
      val item = p.getOrElse("itemName",
        throw new IllegalArgumentException("itemName required"))
      val pageNo = p.getOrElse("pageNo", "1").toInt
      val pageSize = p.getOrElse("pageSize", "20").toInt
      // rank=bm25: hits in relevance order, the reference's actual ES
      // serving behavior; default stays the pinned deterministic sort
      p.getOrElse("rank", "key") match {
        case "bm25" =>
          graft.operators.Ranking.detailByItemRanked(
            spark, dataDir, item, pageNo, pageSize)
        case "key" => Api.detailByItem(spark, dataDir, item, pageNo, pageSize)
        case other =>
          throw new IllegalArgumentException(s"unknown rank mode '$other'")
      }
    })
    server.createContext("/annSearch", handler { p =>
      import graft.operators.IvfIndex
      val vecId = p.getOrElse("vecId",
        throw new IllegalArgumentException("vecId required")).toLong
      val k = p.getOrElse("k", "10").toInt
      val nprobe = p.getOrElse("nprobe", "3").toInt
      if (k <= 0 || nprobe <= 0)
        throw new IllegalArgumentException("k and nprobe must be positive")
      // the query embedding comes from the SOURCE table, not the
      // inverted file: vec_id is not the index's partition key, so a
      // lookup there would scan every cell partition before the pruned
      // search even starts — against the source parquet the pushed
      // vec_id filter row-group-skips and reads two columns. The lookup
      // doubles as the unknown-vecId 400 for both modes.
      val q = graft.Tables.embeddings(spark, dataDir)
        .where(org.apache.spark.sql.functions.col("vec_id") === vecId)
        .select("embedding").collect()
      if (q.isEmpty)
        throw new IllegalArgumentException(s"unknown vecId $vecId")
      // takedown=a,b (q164): serve through the post-takedown inverted
      // file — the deleted vectors' cells patched, everything else
      // manifest-shared; builds gate like /forget, exact mode only
      val takedown = longsParam(p, "takedown")
      // mode=ivfpq: IVF-pruned, PQ-ADC-scored (the compressed serving
      // path, q110); default stays the exact-scored inverted file
      (p.getOrElse("mode", "exact"), takedown) match {
        case ("ivfpq", Nil) =>
          graft.operators.PqIndex.ivfPqSearch(spark, dataDir,
            queryId = vecId, topK = k, nprobe = nprobe)
        case ("exact", Nil) =>
          IvfIndex.searchInvertedFile(spark, annIndexPath, annCentroids,
            q(0).getSeq[Float](0).toArray, excludeId = Some(vecId),
            k = k, nprobe = nprobe)
        case ("exact", ids) =>
          gatedBuild(graft.operators.DocForget
              .isTakedownMemoized(spark, dataDir, ids)) {
            graft.operators.DocForget.takedownAnn(spark, dataDir, ids,
              queryId = vecId, k = k, nprobe = nprobe)
          }
        case ("ivfpq", _) =>
          throw new IllegalArgumentException(
            "takedown is served by the exact inverted file (drop mode)")
        case (other, _) =>
          throw new IllegalArgumentException(s"unknown mode '$other'")
      }
    })
    server.createContext("/searchRanked", handler { p =>
      // BM25-ordered document search — the reference's ES hits came back
      // in relevance-score order; this serves the same contract from the
      // engine (Ranking.bm25Rank, zero-shuffle plan)
      val q = p.getOrElse("q",
        throw new IllegalArgumentException("q required"))
      val topN = p.getOrElse("topN", "20").toInt
      if (topN <= 0 || topN > 1000)
        throw new IllegalArgumentException("topN must be in 1..1000")
      val terms = q.split("\\s+").filter(_.nonEmpty).toSeq
      if (terms.isEmpty)
        throw new IllegalArgumentException("q must contain a term")
      // one fold accumulator field is compiled per term: cap the count so
      // a hostile query string cannot compile an arbitrarily large
      // Catalyst expression tree per request (HTTP 400, like the other
      // endpoints' input validation)
      if (terms.size > 16)
        throw new IllegalArgumentException("q is limited to 16 terms")
      graft.operators.Ranking.bm25Rank(spark, dataDir, terms, topN = topN)
    })
    server.createContext("/fuzzySearch", handler { p =>
      // ES match + fuzziness parity: typo-tolerant item lookup
      val q = p.getOrElse("q",
        throw new IllegalArgumentException("q required"))
      val dist = p.getOrElse("dist", "2").toInt
      val topN = p.getOrElse("topN", "20").toInt
      if (dist < 0 || dist > 4)
        throw new IllegalArgumentException("dist must be in 0..4")
      if (topN <= 0 || topN > 1000)
        throw new IllegalArgumentException("topN must be in 1..1000")
      if (q.length > 200)
        throw new IllegalArgumentException("q is limited to 200 chars")
      graft.operators.FuzzyJoin.fuzzyTermSearch(spark, dataDir, q,
        maxDist = dist, topN = topN)
    })
    server.createContext("/hybridSearch", handler { p =>
      // hybrid lexical+vector search fused by Reciprocal Rank Fusion
      // (q114): BM25 over `q` terms merges with cosine-ANN around
      // `vecId` on rank positions only
      val q = p.getOrElse("q",
        throw new IllegalArgumentException("q required"))
      val vecId = p.getOrElse("vecId",
        throw new IllegalArgumentException("vecId required")).toLong
      val kEach = p.getOrElse("kEach", "50").toInt
      val topN = p.getOrElse("topN", "20").toInt
      if (kEach <= 0 || kEach > 1000)
        throw new IllegalArgumentException("kEach must be in 1..1000")
      if (topN <= 0 || topN > 1000)
        throw new IllegalArgumentException("topN must be in 1..1000")
      val terms = q.split("\\s+").filter(_.nonEmpty).toSeq
      if (terms.isEmpty)
        throw new IllegalArgumentException("q must contain a term")
      if (terms.size > 16) // the /searchRanked fold-width cap
        throw new IllegalArgumentException("q is limited to 16 terms")
      graft.operators.Ranking.hybridRrf(spark, dataDir, terms, vecId,
        kEach = kEach, topN = topN)
    })
    server.createContext("/funnel", handler { p =>
      // strict-order funnel counts (q105) over the event warehouse —
      // the reference's REST-served-analytics shape applied to the
      // behavioral family (steps configurable per request)
      val steps = p.getOrElse("steps", "view,click,purchase")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      if (steps.isEmpty)
        throw new IllegalArgumentException("steps must contain a step")
      if (steps.size > 8) // each step compiles a window column
        throw new IllegalArgumentException("steps is limited to 8")
      graft.operators.Sessionize.funnel(spark, dataDir, steps)
    })
    server.createContext("/anomalies", handler { p =>
      // trailing-window rate anomalies (q120); dense=1 switches to the
      // calendar-hour grid (q123) whose zero rows flag collapses
      val wh = p.getOrElse("windowHours", "24").toInt
      val mw = p.getOrElse("minWindow", "12").toInt
      val k = p.getOrElse("k", "3").toInt
      if (wh > 8760)
        throw new IllegalArgumentException("windowHours is limited to 8760")
      // wh/mw/k coherence checks live in the operator's require (→ 400)
      p.getOrElse("dense", "0") match {
        case "1" => graft.operators.EventRates
          .rateAnomaliesDense(spark, dataDir, wh, mw, k)
        case "0" => graft.operators.EventRates
          .rateAnomalies(spark, dataDir, wh, mw, k)
        case other =>
          throw new IllegalArgumentException(s"dense must be 0|1, got '$other'")
      }
    })
    server.createContext("/paths", handler { p =>
      // top item journeys (q122): k-bounded TakeOrdered, never a scan
      // of the path space
      val len = p.getOrElse("len", "3").toInt
      val topN = p.getOrElse("topN", "50").toInt
      if (len < 2 || len > 8)
        throw new IllegalArgumentException("len must be in 2..8")
      if (topN <= 0 || topN > 1000)
        throw new IllegalArgumentException("topN must be in 1..1000")
      graft.operators.Sessionize.topPaths(spark, dataDir, len, topN)
    })
    server.createContext("/communities", handler { p =>
      // label-propagation communities (q121); node-sized response
      // bounded by the global MaxRows truncation
      val iters = p.getOrElse("iters", "5").toInt
      if (iters < 1 || iters > 50)
        throw new IllegalArgumentException("iters must be in 1..50")
      graft.operators.GraphRank.labelPropagation(spark, dataDir, iters)
    })
    server.createContext("/convergence", handler { p =>
      // per-round convergence diagnostics (q124/q125) — "did N rounds
      // converge" served next to the analytics they audit
      val iters = p.getOrElse("iters", "10").toInt
      if (iters < 1 || iters > 50)
        throw new IllegalArgumentException("iters must be in 1..50")
      p.getOrElse("algo", "pagerank") match {
        case "pagerank" => graft.operators.GraphRank
          .pageRankConvergence(spark, dataDir, iters)
        case "lpa" => graft.operators.GraphRank
          .labelPropagationConvergence(spark, dataDir, iters)
        case other =>
          throw new IllegalArgumentException(
            s"algo must be pagerank|lpa, got '$other'")
      }
    })
    server.createContext("/personalizedRank", handler { p =>
      // q136: seeded random-walk relevance — importance from one
      // item's point of view
      val seed = p.getOrElse("seed", "0").toLong
      val iters = p.getOrElse("iters", "10").toInt
      if (iters < 1 || iters > 50)
        throw new IllegalArgumentException("iters must be in 1..50")
      graft.operators.GraphRank.personalizedRank(spark, dataDir, seed,
        iters)
    })
    server.createContext("/bfsHops", handler { p =>
      // q134: BFS hop distances from a seed item over the transition
      // graph — "how far is everything from this item"
      val seed = p.getOrElse("seed", "0").toLong
      val depth = p.getOrElse("depth", "6").toInt
      if (depth < 1 || depth > 32)
        throw new IllegalArgumentException("depth must be in 1..32")
      graft.operators.GraphRank.bfsHops(spark, dataDir, seed, depth)
    })
    server.createContext("/nextItems", handler { p =>
      // q135: next-item table — top-K successors per item with the
      // exact integer conditional probability
      val topK = p.getOrElse("topK", "3").toInt
      if (topK < 1 || topK > 100)
        throw new IllegalArgumentException("topK must be in 1..100")
      graft.operators.GraphRank.nextItems(spark, dataDir, topK)
    })
    server.createContext("/distinctUsers", handler { p =>
      // q137: HLL distinct-user estimates per event type + cross-type
      // union, with the exact-count audit columns. source=sketch
      // answers from the PERSISTED register table instead (max-merge
      // of ≤ types × 256 rows — the sketch warehouse; never rescans
      // events, so the answer is O(sketch) at any corpus size)
      // source=kmv answers the same surface through the second sketch
      // family (q146 — KMV minima instead of HLL registers), so the
      // two estimators cross-check each other from one endpoint.
      // from/to (ISO dates) switch to the RANGE read (q152): merged
      // day-grain registers, persisted-table or events-built
      val range = (p.get("from"), p.get("to")) match {
        case (Some(f), Some(t)) => Some((f, t))
        case (None, None) => None
        case _ => throw new IllegalArgumentException(
          "from and to must be given together")
      }
      (p.getOrElse("source", "events"), range) match {
        case ("sketch", Some((f, t))) => graft.streaming.SketchStream
          .hllRangeEstimates(spark, sketchDirOr400, f, t)
        case ("events", Some((f, t))) =>
          graft.operators.Sketches.hllUsersRange(spark, dataDir, f, t)
        case ("sketch", None) => graft.streaming.SketchStream
          .hllTableEstimates(spark, sketchDirOr400)
        case ("kmv-sketch", None) => graft.streaming.SketchStream
          .kmvTableEstimates(spark, sketchDirOr400)
        case ("kmv", None) =>
          graft.operators.Sketches.kmvUsers(spark, dataDir)
        case ("events", None) =>
          graft.operators.Sketches.hllUsers(spark, dataDir)
        case ("kmv" | "kmv-sketch", Some(_)) =>
          throw new IllegalArgumentException(
            "source 'kmv'/'kmv-sketch' does not support from/to — " +
              "range reads merge day-grain HLL registers (drop the " +
              "range params or use source=events|sketch)")
        case (other, _) =>
          throw new IllegalArgumentException(s"unknown source '$other'")
      }
    })
    server.createContext("/audienceOverlap", handler { p =>
      // pairwise audience intersection/Jaccard between event types:
      // method=hll (q144, inclusion-exclusion — error grows with the
      // union) or method=kmv (q147, theta-sketch membership counting —
      // error grows with the intersection; the estimator of choice
      // when overlaps are small relative to the audiences).
      // source=sketch answers from the PERSISTED KMV table instead —
      // set algebra over ≤ types × k stored minima, never the events.
      // from=&to= (q156) restricts to a date range — answered by
      // re-top-k over the DAY-GRAIN rows (the intersection query HLL
      // rollups cannot serve); kmv only.
      val range = (p.get("from"), p.get("to")) match {
        case (None, None)       => None
        case (Some(f), Some(t)) => Some((f, t))
        case _ => throw new IllegalArgumentException(
          "from and to must be given together")
      }
      (p.getOrElse("method", "kmv"), p.getOrElse("source", "events"),
        range) match {
        case ("kmv", "sketch", None) => graft.streaming.SketchStream
          .kmvTableOverlap(spark, sketchDirOr400)
        case ("kmv", "sketch", Some((f, t))) => graft.streaming
          .SketchStream.kmvTableRangeOverlap(spark, sketchDirOr400, f, t)
        case ("kmv", "events", None) =>
          graft.operators.Sketches.kmvOverlap(spark, dataDir)
        case ("kmv", "events", Some((f, t))) =>
          graft.operators.Sketches.kmvOverlapRange(spark, dataDir, f, t)
        case ("hll", "events", None) =>
          graft.operators.Sketches.hllOverlap(spark, dataDir)
        case (m, s, r) => throw new IllegalArgumentException(
          s"unsupported method/source/range '$m'/'$s'/${r.isDefined}")
      }
    })
    server.createContext("/heavyHitters", handler { p =>
      // q139: exact frequent items via the Misra-Gries candidate pass
      val phiPpm = p.getOrElse("phiPpm",
        graft.operators.Sketches.DefaultPhiPpm.toString).toLong
      val k = p.getOrElse("k",
        graft.operators.Sketches.DefaultMgK.toString).toInt
      if (k > 4096)
        throw new IllegalArgumentException("k is limited to 4096")
      // phi range + the k >= 1/phi guarantee guard live in the
      // operator; source=sketch re-ranks the persisted exact-count
      // table (vocabulary-bounded) through the same threshold rule
      p.getOrElse("source", "events") match {
        case "sketch" => graft.streaming.SketchStream
          .heavyHitterSnapshot(spark, sketchDirOr400, phiPpm)
        case "events" =>
          graft.operators.Sketches.heavyHitters(spark, dataDir, phiPpm, k)
        case other =>
          throw new IllegalArgumentException(s"unknown source '$other'")
      }
    })
    server.createContext("/quantiles", handler { p =>
      // q142: histogram-sketch p50/p95/p99 per event type + 'ALL'.
      // Normalize BEFORE the operator: empty segments ("50,,99") and
      // duplicates ("50,50" → duplicate pb50 aliases, an
      // AnalysisException = HTTP 500) must surface as 400-class input
      // errors, not planner failures
      val qs = p.getOrElse("q", "50,95,99").split(",").toSeq
        .map(_.trim).filter(_.nonEmpty).map { s =>
          try s.toInt catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"bad percentile '$s'")
          }
        }.distinct
      // percentile range checks live in the operator (→ 400);
      // source=sketch walks the persisted histogram register table
      // (sum-merge of ≤ types × 1024 rows) instead of scanning events
      p.getOrElse("source", "events") match {
        case "sketch" => graft.streaming.SketchStream
          .quantileSnapshot(spark, sketchDirOr400, qs)
        case "events" => graft.operators.Sketches.histQuantilesOn(
          graft.Tables.events(spark, dataDir), qs)
        case other =>
          throw new IllegalArgumentException(s"unknown source '$other'")
      }
    })
    server.createContext("/zorderScan", handler { p =>
      // q145: range scan served from the materialized z-order layout —
      // the quadrant computation prunes to candidate files at the PATH
      // level through the version manifest; bounds guards live in the
      // operator (→ 400). q155: `forgetUser=<u>` serves the same scan
      // through the post-erasure version (user u's rows deleted by
      // quadrant-candidate rewrites) — builds gate like /forget.
      def bound(k: String, dflt: Long) = p.get(k).map(_.toLong).getOrElse(dflt)
      val (uLo, uHi) = (bound("uLo", 0L), bound("uHi", 0L))
      val (iLo, iHi) = (bound("iLo", 0L), bound("iHi", 0L))
      val forgetUsers = p.get("forgetUser").map(u => Seq(u.toLong))
        .orElse(p.get("forgetUsers").map(_.split(",").toSeq
          .map(_.trim).filter(_.nonEmpty).map(_.toLong).distinct))
      forgetUsers match {
        case None => graft.operators.Warehouse
          .zorderScan(spark, dataDir, uLo, uHi, iLo, iHi)
        case Some(us) =>
          gatedBuild(graft.operators.Warehouse
              .isZforgetMemoized(spark, dataDir, us)) {
            graft.operators.Warehouse
              .zorderForgetScanBatch(spark, dataDir, us, uLo, uHi, iLo, iHi)
          }
      }
    })
    server.createContext("/forget", handler { p =>
      // q151/q153: right-to-erasure through the skipping index —
      // answers the post-deletion lookup for the deleted key(s) +
      // probes (the deletion is copy-on-write into a memoized layout
      // version; the served q148 layout is untouched). `key=` deletes
      // one customer, `keys=a,b,c` a whole compliance batch in ONE
      // rewrite job.
      def longs(param: String): Seq[Long] =
        p.getOrElse(param, "").split(",").toSeq
          .map(_.trim).filter(_.nonEmpty).map { s =>
            try s.toLong catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(s"bad $param '$s'")
            }
          }.distinct
      val delKeys = p.get("key").map(k => Seq(k.toLong))
        .getOrElse(longs("keys"))
      if (delKeys.isEmpty)
        throw new IllegalArgumentException("key or keys is required")
      val probes = longs("probe")
      if (probes.isEmpty)
        throw new IllegalArgumentException("probe list is required")
      // an erasure build is a copy-on-write rewrite — cap the serving
      // JVM at ONE in-flight build (round-14 advice: an unauthenticated
      // key sweep must not amplify into back-to-back layout rewrites).
      // A memoized repeat of the SAME batch answers without the gate.
      gatedBuild(graft.operators.BloomSkip
          .isForgetMemoized(spark, dataDir, delKeys)) {
        graft.operators.BloomSkip.forgetKeys(spark, dataDir, delKeys,
          probes)
      }
    })
    server.createContext("/timeTravel", handler { p =>
      // time travel over the SERVED bloom-layout lineage: the q148
      // point lookup as of version N — v1 pre-forget, later versions
      // with their forgets applied; an expired version → 410 Gone
      val version = p.getOrElse("version",
        throw new IllegalArgumentException("version required")).toLong
      val keys = longsParam(p, "keys")
      if (keys.isEmpty)
        throw new IllegalArgumentException("keys is required")
      graft.operators.BloomSkip.lookupAsOf(spark, dataDir, version, keys)
    })
    server.createContext("/lineage", handler { _ =>
      // the served lineage's live versions — the audit surface behind
      // /timeTravel (log only, no data read)
      graft.operators.BloomSkip.lineageVersions(spark, dataDir)
    })
    server.createContext("/rebuildUserSketches", handler { _ =>
      // complete an upstream user erasure inside the sketch warehouse:
      // registers can't unmerge, so the user-keyed register tables
      // REBUILD from the retained events (always a build → gated)
      gatedBuild(memoized = false) {
        val rebuilt = graft.streaming.SketchStream.rebuildUserSketches(
          spark, sketchDirOr400,
          graft.Tables.events(spark, dataDir)
            .select(org.apache.spark.sql.functions.col("event_type"),
              org.apache.spark.sql.functions.col("ts"),
              org.apache.spark.sql.functions.col("user_id")))
        import spark.implicits._
        rebuilt.toDF("rebuilt_table")
      }
    })
    server.createContext("/rebuildBasket", handler { _ =>
      // user erasure completion for the accumulated basket pairs: the
      // stored (user, item) relation is user-keyed personal data —
      // rebuild it from the retained events (always a build → gated)
      gatedBuild(memoized = false) {
        graft.streaming.BasketStream.rebuildRetained(
          spark, sketchDirOr400, graft.Tables.events(spark, dataDir))
        import spark.implicits._
        Seq(("pairs",
          spark.read.parquet(s"$sketchDirOr400/pairs").count()))
          .toDF("rebuilt_table", "rows")
      }
    })
    server.createContext("/rebuildGraph", handler { _ =>
      // user erasure completion for the accumulated item graph: edge
      // weights are aggregates of user transitions that cannot be
      // subtracted per-user — rebuild edges + nodes from the retained
      // events (always a build → gated)
      gatedBuild(memoized = false) {
        graft.streaming.GraphStream.rebuildRetained(
          spark, sketchDirOr400, graft.Tables.events(spark, dataDir))
        import spark.implicits._
        Seq(("edges",
            spark.read.parquet(s"$sketchDirOr400/edges").count()),
          ("nodes",
            spark.read.parquet(s"$sketchDirOr400/nodes").count()))
          .toDF("rebuilt_table", "rows")
      }
    })
    server.createContext("/mediaTakedown", handler { p =>
      // right-to-erasure for the stream-maintained dHash table: the
      // signatures are derived personal data (the q161 principle) —
      // delete the ids' rows so /mediaNearDup?source=sketch can never
      // answer with them again
      val ids = longsParam(p, "ids")
      if (ids.isEmpty)
        throw new IllegalArgumentException("ids is required")
      gatedBuild(memoized = false) {
        val r = graft.streaming.MediaStream.takedownSignatures(
          spark, sketchDirOr400, ids)
        import spark.implicits._
        Seq((r.epochsTotal, r.epochsRewritten, r.rowsDeleted))
          .toDF("epochs_total", "epochs_rewritten", "rows_deleted")
      }
    })
    server.createContext("/clusterTakedown", handler { p =>
      // right-to-erasure for the stream-maintained near-dup cluster
      // table (the q169 machinery over the server's accumulated
      // store): delete the ids' signature rows and re-derive their
      // components' survivors in place — bridge-doc splits included
      val ids = longsParam(p, "ids")
      if (ids.isEmpty)
        throw new IllegalArgumentException("ids is required")
      gatedBuild(memoized = false) {
        val r = graft.streaming.ClusterStream.takedownClusters(
          spark, sketchDirOr400, ids)
        import spark.implicits._
        Seq((r.membersExpanded, r.rowsDeleted, r.survivorsRelabeled,
          r.sigEpochsRewritten, r.mergeEpochsRewritten))
          .toDF("members_expanded", "rows_deleted",
            "survivors_relabeled", "sig_epochs_rewritten",
            "merge_epochs_rewritten")
      }
    })
    server.createContext("/clusterAssignment", handler { p =>
      // the stream-maintained q168 assignment over the server's
      // accumulated cluster store; ids= narrows to the ids'
      // components — the cascade-expansion point read
      val ids = longsParam(p, "ids")
      if (ids.isEmpty)
        graft.streaming.ClusterStream
          .assignmentTable(spark, sketchDirOr400).orderBy("doc_id")
      else graft.streaming.ClusterStream.clusterExpansionFromTable(
        spark, sketchDirOr400, ids)
    })
    server.createContext("/vacuumLayouts", handler { p =>
      // admin retention: expire all but the newest keepLast versions
      // (live serving heads always pinned); unshared files go to the
      // deferred reaper, never inline — readers keep their grace
      graft.operators.BloomSkip.vacuumServedLineage(spark, dataDir,
        p.getOrElse("keepLast", "1").toInt)
    })
    server.createContext("/mediaNearDup", handler { p =>
      // q154: perceptual-hash duplicate report over the media table —
      // exact-dup clusters (hamming 0) + banded near-pairs, per media
      // type. maxHamming/bands are request parameters; the lossless-
      // band guard (maxHamming < bands) lives in the operator → 400.
      // source=sketch answers from the stream-maintained signature
      // TABLE (payload bytes never re-read)
      val maxHamming = p.getOrElse("maxHamming", "3").toInt
      val bands = p.getOrElse("bands", "4").toInt
      p.getOrElse("source", "scan") match {
        case "sketch" => graft.streaming.MediaStream
          .mediaNearDupFromTable(spark, sketchDirOr400, maxHamming, bands)
        case "scan" => graft.operators.Multimodal
          .mediaNearDup(spark, dataDir, maxHamming, bands)
        case other =>
          throw new IllegalArgumentException(s"unknown source '$other'")
      }
    })
    server.createContext("/priceQuantiles", handler { _ =>
      // q150: auto-ranged histogram quantiles of o_totalprice per
      // priority + 'ALL', with grid columns and the exact audit
      graft.operators.Sketches.priceQuantiles(spark, dataDir)
    })
    server.createContext("/itemFrequency", handler { p =>
      // q149: Count-Min point frequencies for the requested items —
      // source=sketch answers from the persisted counter table
      // (depth x width sums, never the event log); source=events runs
      // the batch operator's audited catalog scan
      val items = p.getOrElse("items", "").split(",").toSeq
        .map(_.trim).filter(_.nonEmpty).map { s =>
          try s.toLong catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"bad item '$s'")
          }
        }.distinct
      def catalogScan = {
        val all = graft.operators.Sketches.cmsCounts(spark, dataDir)
        if (items.isEmpty) all
        else all.where(org.apache.spark.sql.functions.col("item")
          .isin(items: _*))
      }
      p.getOrElse("source", "events") match {
        case "sketch" => graft.streaming.SketchStream
          .cmsTableEstimates(spark, sketchDirOr400, items)
        case "events" =>
          // the catalog scan PROJECTED to the sketch contract
          // (item, est_cnt) — clients may switch sources without a
          // schema change; the audit columns live under source=audit
          catalogScan.select("item", "est_cnt")
        case "audit" =>
          // the full audited scan: (item, est_cnt, exact_cnt, err)
          catalogScan
        case other =>
          throw new IllegalArgumentException(s"unknown source '$other'")
      }
    })
    server.createContext("/pointLookup", handler { p =>
      // q148: point lookup on o_custkey through the per-file bloom
      // index — candidate-file pruning over the arrival-keyed layout;
      // key-count cap and parse errors → 400. q157: `from=&to=` adds a
      // date range — answered through the date-clustered layout by
      // INTERSECTING the bloom and min/max indexes before the scan.
      val keys = p.getOrElse("keys", "").split(",").toSeq
        .map(_.trim).filter(_.nonEmpty).map { s =>
          try s.toLong catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"bad key '$s'")
          }
        }.distinct
      // q159: forget=a,b deletes those customers from the composed
      // layout first (both indexes patched), then probes through the
      // post-erasure version — builds gate like /forget
      val del = p.getOrElse("forget", "").split(",").toSeq
        .map(_.trim).filter(_.nonEmpty).map { s =>
          try s.toLong catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"bad forget key '$s'")
          }
        }.distinct
      (p.get("from"), p.get("to")) match {
        case (None, None) if del.isEmpty =>
          graft.operators.BloomSkip.pointLookup(spark, dataDir, keys)
        case (None, None) => throw new IllegalArgumentException(
          "forget needs from and to (the composed layout)")
        case (Some(f), Some(t)) if del.isEmpty => graft.operators
          .BloomSkip.lookupKeysInRange(spark, dataDir, keys, f, t)
        case (Some(f), Some(t)) =>
          gatedBuild(graft.operators.BloomSkip
              .isDatedForgetMemoized(spark, dataDir, del)) {
            graft.operators.BloomSkip
              .forgetKeysInRange(spark, dataDir, del, keys, f, t)
          }
        case _ => throw new IllegalArgumentException(
          "from and to must be given together")
      }
    })
    server.createContext("/collocations", handler { p =>
      // PMI collocation mining (q127): top bigrams by the fixed-point
      // lift — phrase discovery served next to the corpus it describes
      val minCount = p.getOrElse("minCount", "5").toLong
      val topK = p.getOrElse("topK", "100").toInt
      if (topK > 1000)
        throw new IllegalArgumentException("topK is limited to 1000")
      // minCount/topK positivity checks live in the operator (→ 400)
      graft.operators.TextAnalysis
        .pmiCollocations(spark, dataDir, minCount, topK)
    })
    server.createContext("/basketLift", handler { p =>
      // market-basket lift (q132): item pairs by co-engagement lift
      val minCount = p.getOrElse("minCount", "5").toLong
      val topK = p.getOrElse("topK", "100").toInt
      val maxBasket = p.getOrElse("maxBasket",
        graft.operators.Sessionize.MaxBasket.toString).toInt
      if (topK > 1000)
        throw new IllegalArgumentException("topK is limited to 1000")
      if (maxBasket > 4096)
        throw new IllegalArgumentException("maxBasket is limited to 4096")
      // positivity checks live in the operator (→ 400); mode=rules
      // serves the directional support/confidence/lift triple (q133)
      p.getOrElse("mode", "lift") match {
        case "rules" => graft.operators.Sessionize
          .basketRules(spark, dataDir, minCount, topK, maxBasket)
        case "lift" => graft.operators.Sessionize
          .basketLift(spark, dataDir, minCount, topK, maxBasket)
        case other =>
          throw new IllegalArgumentException(s"unknown mode '$other'")
      }
    })
    server.createContext("/phraseSearch", handler { p =>
      // positional phrase search (q129): ES match_phrase over the
      // corpus — q is the space-separated phrase
      val q = p.getOrElse("q", "query big part")
      val phrase = q.split("\\s+").filter(_.nonEmpty).toSeq
      if (phrase.length > 8)
        throw new IllegalArgumentException("phrase is limited to 8 terms")
      // empty-phrase require lives in the operator (→ 400);
      // mode=indexed serves from the persisted postings index (built
      // once per corpus, memoized — the repeated-query path);
      // takedown=a,b (q163) serves through the POST-TAKEDOWN postings
      // layout — the deleted docs' term buckets patched, builds gated
      val takedown = longsParam(p, "takedown")
      (p.getOrElse("mode", "scan"), takedown) match {
        // a bad mode must 400 even when takedown is present — never a
        // silently different serving path for a typo
        case (m, _) if m != "scan" && m != "indexed" =>
          throw new IllegalArgumentException(s"unknown mode '$m'")
        case (_, ids) if ids.nonEmpty =>
          gatedBuild(graft.operators.DocForget
              .isTakedownMemoized(spark, dataDir, ids)) {
            graft.operators.DocForget
              .takedownPhrase(spark, dataDir, ids, phrase)
          }
        case ("indexed", _) =>
          graft.operators.Ranking.phraseSearchIndexed(spark, dataDir, phrase)
        case _ =>
          graft.operators.Ranking.phraseSearch(spark, dataDir, phrase)
      }
    })
    server.createContext("/docTakedown", handler { p =>
      // q161/q162/q165: right-to-erasure for the DOCUMENT corpus —
      // the batch deleted from the corpus layout, packed shards,
      // corpus Bloom, postings and IVF in four one-job rewrites;
      // view=scan probes deleted ids + survivors through the patched
      // corpus index, view=pack returns the repacked shard manifest,
      // view=report the exact per-artifact deletion accounting
      val seeds = longsParam(p, "ids")
      if (seeds.isEmpty)
        throw new IllegalArgumentException("ids is required")
      // cascade=1 (q166): expand the seeds through their q60 near-dup
      // clusters first — remove the content, not one copy of it;
      // view=expansion (q167) returns the cascade without deleting
      val cascade = p.getOrElse("cascade", "0") match {
        case "1" => true
        case "0" => false
        case other => throw new IllegalArgumentException(
          s"cascade must be 0|1, got '$other'")
      }
      // source=table (round-16 verdict #4): expansion reads the
      // stream-maintained cluster table (a point read once the table
      // store is built) instead of re-deriving MinHash-LSH +
      // components per corpus fingerprint
      val fromTable = p.getOrElse("source", "recompute") match {
        case "table" => true
        case "recompute" => false
        case other => throw new IllegalArgumentException(
          s"source must be recompute|table, got '$other'")
      }
      // the cascade expansion is itself a corpus-scale build (MinHash-
      // LSH + components; table source: the one-time store build) — it
      // must run INSIDE the load-shed gate, and repeats serve from the
      // expansion memo / the built table
      if (p.get("view").contains("expansion")) {
        if (fromTable)
          gatedBuild(graft.streaming.ClusterStream
              .isTableMemoized(spark, dataDir)) {
            graft.streaming.ClusterStream.clusterExpansionFromTable(
              spark, graft.streaming.ClusterStream.tableFor(spark, dataDir),
              seeds)
          }
        else
          gatedBuild(graft.operators.DocForget
              .isExpansionMemoized(spark, dataDir, seeds)) {
            graft.operators.DocForget
              .clusterExpansionCached(spark, dataDir, seeds)
          }
      } else {
        def expandSeeds(): Seq[Long] =
          if (!cascade) seeds
          else if (fromTable) graft.streaming.ClusterStream.expandFromTable(
            spark, graft.streaming.ClusterStream.tableFor(spark, dataDir),
            seeds)
          else graft.operators.DocForget.expandCluster(spark, dataDir, seeds)
        val expansionReady = !cascade ||
          (if (fromTable)
            graft.streaming.ClusterStream.isTableMemoized(spark, dataDir)
          else graft.operators.DocForget
            .isExpansionMemoized(spark, dataDir, seeds))
        // expand ONCE when the expansion source is ready (the
        // recompute path would memo-hit, but the table path re-reads
        // per call) and reuse the ids inside the gate
        val preIds = if (expansionReady) Some(expandSeeds()) else None
        val memoized = preIds.exists(ids =>
          graft.operators.DocForget.isTakedownMemoized(spark, dataDir, ids))
        gatedBuild(memoized) {
          val ids = preIds.getOrElse(expandSeeds())
          p.getOrElse("view", "scan") match {
            case "scan" =>
              val probes = longsParam(p, "probe")
              if (probes.isEmpty)
                throw new IllegalArgumentException(
                  "probe list is required for view=scan")
              graft.operators.DocForget.takedownScan(spark, dataDir, ids,
                probes.filterNot(ids.contains))
            case "pack" =>
              graft.operators.DocForget.takedownPack(spark, dataDir, ids)
            case "report" =>
              graft.operators.DocForget.takedownReport(spark, dataDir, ids)
            case other =>
              throw new IllegalArgumentException(s"unknown view '$other'")
          }
        }
      }
    })
    server.createContext("/moreLikeThis", handler { p =>
      // more-like-this (q130): doc-to-doc retrieval by characteristic
      // terms, integer BM25-shaped scoring
      val docId = p.getOrElse("docId", "1").toLong
      val m = p.getOrElse("m", "10").toInt
      val topN = p.getOrElse("topN", "20").toInt
      if (m > 100)
        throw new IllegalArgumentException("m is limited to 100")
      if (topN > 1000)
        throw new IllegalArgumentException("topN is limited to 1000")
      // m/topN positivity checks live in the operator (→ 400)
      graft.operators.Ranking.moreLikeThis(spark, dataDir, docId, m, topN)
    })
    server.createContext("/entityLink", handler { p =>
      // fuzzy entity linking (q128): free-text bigram mentions resolved
      // against the part-name catalog at distance ≤ maxDist
      val maxDist = p.getOrElse("maxDist", "2").toInt
      if (maxDist < 1 || maxDist > 4)
        throw new IllegalArgumentException("maxDist must be in 1..4")
      graft.operators.FuzzyJoin.fuzzyLink(spark, dataDir, maxDist)
    })
    server.createContext("/rerankSearch", handler { p =>
      val vecId = p.getOrElse("vecId",
        throw new IllegalArgumentException("vecId required")).toLong
      val k = p.getOrElse("k", "10").toInt
      val coarseDims = p.getOrElse("coarseDims", "16").toInt
      val shortlist = p.getOrElse("shortlist", "50").toInt
      if (k <= 0 || coarseDims <= 0 || shortlist < k)
        throw new IllegalArgumentException(
          "need k > 0, coarseDims > 0, shortlist >= k")
      graft.operators.Similarity.rerankTopK(spark, dataDir, vecId,
        coarseDims, shortlist, k)
    })
    server.start()
    this
  }

  /** The ANN endpoint's index, built once on first use (the index-build
    * step of an ANN service): trained centroids + the cell-partitioned
    * inverted file, so each request reads only the probed cells'
    * partitions instead of scanning and re-assigning the corpus. Shares
    * the per-JVM memo with q38/q56 — a Bench/Verify host that already
    * built this dir's index serves requests with zero build cost. */
  private lazy val annBuilt: (String, graft.operators.IvfIndex.Centroids) =
    graft.operators.IvfIndex.invertedFileCached(spark, dataDir,
      cells = 8, iters = 2)
  private def annIndexPath: String = annBuilt._1
  private def annCentroids: graft.operators.IvfIndex.Centroids = annBuilt._2

  def stop(): Unit = server.stop(0)
}
