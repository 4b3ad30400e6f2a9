package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins: salting.
  *
  * AQE splits skewed shuffle partitions for batch sort-merge joins, but
  * not every join can rely on it (stream-static joins, pre-AQE plans,
  * aggregation-free shuffles). The classic remedy: spread each hot key
  * over `buckets` sub-keys on the skewed side and replicate the other
  * side once per bucket, turning one oversized task into `buckets`
  * even-sized ones at the cost of a `buckets`× blow-up of the (small)
  * replicated side.
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** `skewed ⋈ other` on `key`, with the skewed side salted into
    * `buckets` sub-keys and the other side replicated per bucket. Result
    * equals the plain join.
    *
    * The salt MUST be independent of row content: the canonical skew case
    * is millions of *identical* rows on one hot key, and any content hash
    * assigns them all the same salt — the hot partition never splits.
    * `monotonically_increasing_id` gives each physical row a distinct
    * value regardless of content ((partitionId << 33) + row index, so
    * consecutive rows land in consecutive buckets — an even spread within
    * every scan partition). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // replication is only sound when unmatched OTHER-side rows are never
    // emitted: under right/full outer they would surface once per salt
    // bucket — `buckets` duplicates instead of one null-padded row
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(jt),
      s"saltedJoin cannot preserve '$joinType' semantics: " +
        "unmatched rows of the replicated side would duplicate per bucket")
    val salted = skewed.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val replicated = other.withColumn(SaltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
