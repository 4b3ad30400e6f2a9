package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1b")
    val docs = Tables.documents(spark, d)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      r
    }
    for (t <- Seq(0.3, 0.5, 0.7)) {
      val nC = time(f"counting t=$t%.1f") {
        graft.operators.Dedup
          .ngramJaccardPairsCounting(docs, t, 3, 1000).count()
      }
      graft.Caches.releaseAll()
      val nP = time(f"prefix   t=$t%.1f") {
        graft.operators.Dedup
          .ngramJaccardPairsPrefix(docs, t, 3, 1000).count()
      }
      graft.Caches.releaseAll()
      println(s"[probe] rows counting=$nC prefix=$nP match=${nC == nP}")
    }
    spark.stop()
  }
}
