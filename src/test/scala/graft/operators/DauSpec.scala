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

  test("dauDayOverDay lag matches previous day's dau") {
    val rows = Dau.dauDayOverDay(spark, sf).collect()
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getLong(2) == prev.getLong(1),
        s"dau_yd of ${cur.getString(0)} != dau of ${prev.getString(0)}")
    }
    assert(rows.head.getLong(2) == 0L)
  }
}
