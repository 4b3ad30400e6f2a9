package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality checks — the Deequ/Great-Expectations role:
  * the validation gate a 100 TB ingest runs BEFORE training jobs
  * consume a drop. No reference counterpart (north-star extension; the
  * reference trusts its Kafka topics blindly).
  *
  * Shape: each table's metrics come from ONE aggregation pass
  * (completeness, compliance, uniqueness, freshness all fold in the
  * same map-side combine — adding a metric adds a column, not a scan),
  * then `stack()` unpivots the single metric row into the (entity,
  * metric, value) report relation. Referential integrity is the only
  * metric that needs a second relation: a broadcast anti-join per
  * foreign key, counting orphans. All values are integer (counts or
  * ppm fractions with `div`), so the report is engine-exact. */
object Checks {

  /** q143: the corpus quality report over events / orders / lineitem —
    * row counts, key uniqueness (ppm), column completeness (ppm),
    * domain compliance (ppm), freshness (max event time), and
    * foreign-key orphan counts. One aggregation per table + one
    * broadcast anti-join per FK. */
  def qualityReport(spark: SparkSession, dir: String): DataFrame =
    qualityReportOn(Tables.events(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir), Tables.customer(spark, dir))

  /** [[qualityReport]] over explicit relations (spec fixtures corrupt
    * these deliberately — nulls, dupes, domain violations, orphans). */
  def qualityReportOn(ev: DataFrame, orders: DataFrame,
      lineitem: DataFrame, customer: DataFrame): DataFrame = {
    val evm = ev.agg(
      count(lit(1)).as("n"),
      countDistinct(col("event_id")).as("dk"),
      sum(when(col("user_id").isNotNull, 1L).otherwise(0L)).as("nnu"),
      sum(when(col("event_type").isNotNull && col("event_type") =!= "", 1L)
        .otherwise(0L)).as("nnt"),
      sum(when(col("value") >= 0.0, 1L).otherwise(0L)).as("vok"),
      max(unix_micros(col("ts").cast("timestamp"))).as("mts"))
      .selectExpr("stack(6, " +
        "'rows', n, " +
        "'event_id_unique_ppm', dk * 1000000 div n, " +
        "'user_id_complete_ppm', nnu * 1000000 div n, " +
        "'event_type_complete_ppm', nnt * 1000000 div n, " +
        "'value_nonneg_ppm', vok * 1000000 div n, " +
        "'max_ts_micros', mts) AS (metric, value)")
      .withColumn("entity", lit("events"))

    val om = orders.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("dk"),
      sum(when(col("o_totalprice") > 0.0, 1L).otherwise(0L)).as("pok"))
      .selectExpr("stack(3, " +
        "'rows', n, " +
        "'o_orderkey_unique_ppm', dk * 1000000 div n, " +
        "'totalprice_positive_ppm', pok * 1000000 div n) " +
        "AS (metric, value)")
      .withColumn("entity", lit("orders"))

    val lm = lineitem.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity") > 0.0, 1L).otherwise(0L)).as("qok"),
      sum(when(col("l_discount") >= 0.0 && col("l_discount") <= 1.0, 1L)
        .otherwise(0L)).as("dok"))
      .selectExpr("stack(3, " +
        "'rows', n, " +
        "'quantity_positive_ppm', qok * 1000000 div n, " +
        "'discount_in_unit_ppm', dok * 1000000 div n) AS (metric, value)")
      .withColumn("entity", lit("lineitem"))

    // referential integrity: orphans = fact keys with no dimension row.
    // The dim key set broadcasts (it is the smaller, distinct side).
    val orphanOrders = orders.join(
      broadcast(customer.select(col("c_custkey").as("o_custkey")).distinct()),
      Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("value"))
      .withColumn("metric", lit("orphan_custkey"))
      .withColumn("entity", lit("orders"))
      .select(col("metric"), col("value"), col("entity"))
    val orphanLines = lineitem.join(
      orders.select(col("o_orderkey").as("l_orderkey")).distinct(),
      Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("value"))
      .withColumn("metric", lit("orphan_orderkey"))
      .withColumn("entity", lit("lineitem"))
      .select(col("metric"), col("value"), col("entity"))

    evm.union(om).union(lm).union(orphanOrders).union(orphanLines)
      .select(col("entity"), col("metric"), col("value").cast("long"))
      .orderBy("entity", "metric")
  }

  /** A declared bound on one metric — the verification-suite role:
    * `value` must land in [min, max] or the drop is held back. */
  case class Bound(metric: String, min: Long, max: Long) {
    require(min <= max, s"bound on $metric: min $min > max $max")
  }

  /** Per-batch metric row for a DOCUMENT relation (doc_id, text, ...),
    * the ingest-gate twin of [[qualityReport]]: ONE aggregation pass,
    * all-integer (counts and ppm via `div`), so the gate verdict is
    * deterministic under replay. */
  def docReport(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n"),
      sum(when(col("text").isNotNull && length(col("text")) > 0, 1L)
        .otherwise(0L)).as("nnt"),
      countDistinct(col("doc_id")).as("dk"),
      coalesce(sum(length(col("text")).cast("long")), lit(0L)).as("tl"))
      .selectExpr("stack(4, " +
        "'rows', n, " +
        "'text_complete_ppm', CASE WHEN n = 0 THEN 1000000 " +
        "ELSE nnt * 1000000 div n END, " +
        "'doc_id_unique_ppm', CASE WHEN n = 0 THEN 1000000 " +
        "ELSE dk * 1000000 div n END, " +
        "'mean_text_len', CASE WHEN nnt = 0 THEN 0 ELSE tl div nnt END) " +
        "AS (metric, value)")
      .withColumn("entity", lit("documents"))
      .select(col("entity"), col("metric"), col("value").cast("long"))

  /** Evaluate declared [[Bound]]s against a (metric, value) report —
    * one human-readable violation line per breached bound. The collect
    * is the METRIC row set (a handful of rows by construction), never
    * data. Metrics the report lacks are violations too: a gate that
    * silently skips an undeclared metric is a gate that rots. */
  def violations(report: DataFrame, bounds: Seq[Bound]): Seq[String] = {
    val got = report.select(col("metric"), col("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bounds.flatMap { b =>
      got.get(b.metric) match {
        case None => Some(s"${b.metric}: metric absent from report")
        case Some(v) if v < b.min || v > b.max =>
          Some(s"${b.metric}=$v outside [${b.min}, ${b.max}]")
        case _ => None
      }
    }
  }
}
