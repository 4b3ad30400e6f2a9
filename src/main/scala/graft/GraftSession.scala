package graft

import org.apache.spark.sql.SparkSession

/** Canonical session config for the engine. Kept in one place so Verify,
  * Bench, and tests run identical semantics:
  *  - UTC session timezone (oracle parity),
  *  - AQE on (runtime re-plan, skew-join splitting at scale),
  *  - shuffle partitions sized to local cores (not the 200 default),
  *  - nanosAsLong: the driver's `events` table carries TIMESTAMP(NANOS)
  *    which Spark's vectorized reader refuses; read as Long and normalize
  *    in Tables.events (truncate to micros, same as the oracle's cast).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // partition values stay strings on read-back (dt=2024-01-01 would
      // otherwise type-infer to DATE and diverge from the written column)
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Fully-qualified class name of Spark's RocksDB state store provider
    * (ships with Spark ≥3.2; rocksdbjni is on the classpath). */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** [[builder]] with streaming state kept in RocksDB instead of the
    * default in-heap HDFSBackedStateStore. The deployment answer once
    * stateful-streaming state (the ±24 h stream-stream join buffer, the
    * per-day dedup set, sessionization timers) outgrows executor heap:
    * RocksDB spills to local SSD and checkpoints changelogs, so state
    * size is bounded by disk, not memory. Changelog checkpointing keeps
    * commits O(delta) rather than O(state). Batch-only hosts (Verify,
    * Bench) stay on [[builder]] — the provider only matters to streaming
    * queries. */
  def builderWithRocksDB(cpus: String): SparkSession.Builder =
    builder(cpus)
      .config("spark.sql.streaming.stateStore.providerClass", RocksDBProvider)
      .config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
}
