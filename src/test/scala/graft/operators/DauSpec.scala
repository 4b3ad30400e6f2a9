package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the DAU pipeline (J5 per-day distinct, A1/A2). */
class DauSpec extends SparkSpec {

  test("dauTotal equals countDistinct per day") {
    val byOp = Dau.dauTotal(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Dau.withDay(graft.Tables.events(spark, sf))
      .groupBy("dt").agg(countDistinct("user_id").as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp == direct)
  }

  test("dauByHour keeps exactly one row per (user, day)") {
    val total = Dau.dauByHour(spark, sf)
      .agg(sum("cnt")).collect()(0).getLong(0)
    val users = Dau.withDay(graft.Tables.events(spark, sf))
      .select("dt", "user_id").distinct().count()
    assert(total == users)
  }

  test("dauDayOverDay joins previous calendar day's dau (0 when absent)") {
    val df = Dau.dauDayOverDay(spark, sf)
    // the point of the self-join shape: no single-partition WindowExec
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "dauDayOverDay must not use a window operator")
    val rows = df.collect()
    graft.Caches.releaseAll()
    val byDt = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val prev = java.time.LocalDate.parse(r.getString(0)).minusDays(1).toString
      assert(r.getLong(2) == byDt.getOrElse(prev, 0L),
        s"dau_yd of ${r.getString(0)} != dau of $prev")
    }
    assert(rows.head.getLong(2) == 0L)
  }
}
