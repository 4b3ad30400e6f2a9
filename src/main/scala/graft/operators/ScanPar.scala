package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard (optimization guide §2.5 "input skew: one
  * huge unsplittable file", §6 input split sizing).
  *
  * A parquet file splits only at row-group boundaries, and each
  * scale-factor table here is ONE single-row-group file — so every
  * map-heavy operator (shingling, tokenization, JSON parsing,
  * edit-distance kernels) would otherwise run its whole map stage as a
  * single task while the remaining cores idle (measured: q84's
  * chunk+groupBy ran 1.66 s in one task out of a 1.99 s query). At
  * production scale a table arrives as many files/row groups and this
  * wrapper is a NO-OP: it inserts a round-robin redistribution only
  * when the scan's own split count is materially below the session's
  * parallelism — the guide's "repartition immediately after the read"
  * remedy, gated so it can never add an exchange to an already-parallel
  * scan. The inserted exchange carries the SOURCE rows (pre-explode,
  * pre-shingle — a few MB moved once) so the expensive per-row work
  * that follows uses every core; it is round-robin, so no key skew and
  * no semantic effect on any downstream keyed operation.
  */
object ScanPar {
  /** `df` redistributed to the session's parallelism iff its current
    * plan would execute on fewer than half that many partitions.
    * Apply ONLY where the downstream per-row work is expensive enough
    * to dominate an exchange of the source rows — cheap scan+aggregate
    * queries keep their exchange-free shape. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target)
  }
}
