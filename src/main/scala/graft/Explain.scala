package graft

/** Dev tool: dump formatted physical plans (runMain graft.Explain [q..]),
  * or with "--scan" print a one-line plan-smell summary per query:
  * cartesian products, nested-loop joins, row counts of exchanges.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_SF_DIR: plan shapes are stats-driven (file-size based
    // broadcast selection), so the scale-validation run diffs --scan
    // output across sf dirs to catch joins that silently flip strategy
    // as the data grows
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val scan = args.contains("--scan")
    val wanted =
      if (args.filterNot(_ == "--scan").nonEmpty) args.filterNot(_ == "--scan").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    wanted.foreach { q =>
      val df = SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString()
      if (scan) {
        val smells = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "shuffles" -> false).collect { case (n, true) => n }
        val nShuffle = "Exchange (?:hash|range)partitioning".r
          .findAllIn(plan).length
        println(f"$q%-26s shuffles=$nShuffle ${smells.mkString(",")}")
      } else {
        println(s"========== $q ==========")
        df.explain("formatted")
      }
    }
    spark.stop()
  }
}
