package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import scala.collection.mutable
import scala.util.control.NonFatal

/** Measurement tool (guide §1): per-job / per-stage wall breakdown for
  * one or more registered queries, on a warm JVM. NOT part of the bench
  * contract — Bench.scala stays the driver's timing instrument; this
  * exists so optimization targets the stage that actually costs, not a
  * guess. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.Profile q22_jaccard_pairs q95_containment_pairs"
  *
  * Each query runs `warmups` untimed passes (codegen/JIT), then one
  * instrumented pass that prints every job (with its group/description)
  * and its stages: duration, task count, shuffle bytes.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmups = sys.env.getOrElse("SPARK_GRAFT_PROFILE_WARMUPS", "2").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables(spark, sfDir, n).limit(1).count())
    val wanted =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted

    final case class StageRow(id: Int, name: String, ms: Long, tasks: Int,
        shuffleReadMb: Double, shuffleWriteMb: Double, inputMb: Double)
    final case class JobRow(id: Int, desc: String, ms: Long,
        stages: mutable.Buffer[StageRow])

    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val jobStart = mutable.Map.empty[Int, Long]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStart(e.jobId) = e.time
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRow(e.jobId, desc, -1, mutable.Buffer.empty)
        }
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach { j =>
            jobs(e.jobId) = j.copy(ms = e.time - jobStart.getOrElse(e.jobId, e.time))
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val row = StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
          (for {c <- si.completionTime; s <- si.submissionTime} yield c - s)
            .getOrElse(-1L),
          si.numTasks,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6)
        jobs.synchronized {
          stageToJob.get(si.stageId).flatMap(jobs.get)
            .foreach(_.stages += row)
        }
      }
    }

    wanted.foreach { q =>
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query: $q"))
      var i = 0
      while (i < warmups) {
        try { fn(spark, sfDir).count() }
        catch { case NonFatal(e) =>
          System.err.println(s"[profile] $q warmup failed: ${e.getMessage}")
          i = warmups }
        Caches.releaseAll()
        i += 1
      }
      jobs.synchronized { jobs.clear() }; jobStart.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case NonFatal(e) =>
        System.err.println(s"[profile] $q failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      Caches.releaseAll()
      // listener events are async; give the bus a moment to drain
      // (listenerBus.waitUntilEmpty is private[spark])
      Thread.sleep(800)
      spark.sparkContext.removeSparkListener(listener)
      println(f"==== $q%-28s total=$dt%7.3f s ====")
      val snap = jobs.synchronized { jobs.values.toList }
      val jobSum = snap.map(_.ms.max(0)).sum / 1e3
      println(f"  jobs=${snap.size} jobWallSum=$jobSum%.3f s (driver/plan gap=${dt - jobSum}%.3f s)")
      snap.foreach { j =>
        println(f"  job ${j.id}%3d ${j.ms}%6d ms  ${j.desc.take(70)}")
        j.stages.sortBy(_.id).foreach { s =>
          println(f"    stage ${s.id}%4d ${s.ms}%6d ms tasks=${s.tasks}%3d " +
            f"in=${s.inputMb}%8.2f MB sr=${s.shuffleReadMb}%8.2f sw=${s.shuffleWriteMb}%8.2f  ${s.name.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
