package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{BasketEvent, BasketStream, GraphEvent, GraphStream}

/** The streaming twins' own scale gate (run once per round at sf1):
  * drive GraphStream and BasketStream over the FULL sf-scale event
  * stream chunked into ~20 micro-batch epochs with compaction enabled,
  * then pin each snapshot row-equal to its batch operator (q104
  * PageRank / q132 basket lift) over the same events — the fixture
  * specs' parity contract exercised at 10⁶ events instead of 10².
  *
  *   sbt "runMain graft.TwinScaleGate /tmp/sf1 20 5"
  *
  * Prints one summary line per twin: epochs processed, epoch-partition
  * directory counts with compaction (vs. the one-dir-per-epoch growth
  * without), and MATCH/MISMATCH against the batch operator. Results
  * are recorded in SCALING.md. */
object TwinScaleGate {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val nChunks = if (args.length > 1) args(1).toInt else 20
    val compactEvery = if (args.length > 2) args(2).toInt else 5
    val spark = GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def partDirs(dir: String): Int =
      Option(new java.io.File(dir).list()).toSeq.flatten
        .count(_.startsWith("epoch="))

    // ---- GraphStream vs batch q104 --------------------------------
    // per-user event-time-monotone arrival across batches is the
    // twin's parity contract: chunk the stream in global (ts,
    // event_id) order
    val graphEvents = GraphStream
      .projectEvents(Tables.events(spark, sfDir))
      .orderBy("ts", "event_id").collect().toSeq
    val chunk = math.max(1, (graphEvents.size + nChunks - 1) / nChunks)
    val gOut = java.nio.file.Files
      .createTempDirectory("twin_scale_graph").toString
    val gMem = MemoryStream[GraphEvent]
    val gq = GraphStream.transitionStream(gMem.toDS())
      .writeStream
      .foreachBatch(GraphStream.edgeSinkEachBatch(gOut, compactEvery) _)
      .outputMode("append").start()
    var gEpochs = 0
    val t0 = System.nanoTime()
    graphEvents.grouped(chunk).foreach { c =>
      gMem.addData(c: _*); gq.processAllAvailable(); gEpochs += 1
    }
    gq.stop()
    val gStreamSecs = (System.nanoTime() - t0) / 1e9
    val gotRank = GraphStream.rankSnapshot(spark, gOut)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val wantRank = operators.GraphRank.pageRank(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    println(s"[twin-scale] graph: events=${graphEvents.size} " +
      s"epochs=$gEpochs streamSecs=${f"$gStreamSecs%.1f"} " +
      s"edgeDirs=${partDirs(s"$gOut/edges")} " +
      s"nodeDirs=${partDirs(s"$gOut/nodes")} (uncompacted would be " +
      s"$gEpochs each) rank=${if (gotRank == wantRank) "MATCH"
        else "MISMATCH"} nodes=${wantRank.size}")
    require(gotRank == wantRank, "graph twin diverged from batch q104")

    // ---- BasketStream vs batch q132 -------------------------------
    val basketEvents = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions
          .get_json_object(org.apache.spark.sql.functions.col("props"),
            "$.k").cast("long").as("k"))
      .where("k is not null")
      .as[BasketEvent].collect().toSeq
    val bChunk = math.max(1, (basketEvents.size + nChunks - 1) / nChunks)
    val bOut = java.nio.file.Files
      .createTempDirectory("twin_scale_basket").toString
    val bMem = MemoryStream[BasketEvent]
    val bq = bMem.toDS()
      .transform(BasketStream.basketDeltaStream(_))
      .writeStream
      .foreachBatch(BasketStream.basketSinkEachBatch(bOut, compactEvery) _)
      .outputMode("append").start()
    var bEpochs = 0
    val t1 = System.nanoTime()
    basketEvents.grouped(bChunk).foreach { c =>
      bMem.addData(c: _*); bq.processAllAvailable(); bEpochs += 1
    }
    bq.stop()
    val bStreamSecs = (System.nanoTime() - t1) / 1e9
    val gotLift = BasketStream.liftSnapshot(spark, bOut)
      .collect().map(_.toSeq).toSeq
    val wantLift = operators.Sessionize.basketLift(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    println(s"[twin-scale] basket: events=${basketEvents.size} " +
      s"epochs=$bEpochs streamSecs=${f"$bStreamSecs%.1f"} " +
      s"pairDirs=${partDirs(s"$bOut/pairs")} (uncompacted would be " +
      s"$bEpochs) lift=${if (gotLift == wantLift) "MATCH"
        else "MISMATCH"} rows=${wantLift.size}")
    require(gotLift == wantLift, "basket twin diverged from batch q132")
    spark.stop()
  }
}
