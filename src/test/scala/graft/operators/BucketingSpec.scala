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
}
