package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q06_order_wide_enriched", "q11_stats_by_item", "q01_dau_total", "q26_ann_topk", "q27_blocked_neardup")) {
      println(s"========== $q ==========")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
