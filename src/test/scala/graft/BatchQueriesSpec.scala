package graft

/** Smoke + contract checks for every SparkEntry query: runs on sf0.001,
  * asserts non-degenerate output and that every oracle key has a query.
  * (Value-level parity vs DuckDB is exercised by the driver's gate and
  * locally via tools/check.py — not re-implemented here.)
  */
class BatchQueriesSpec extends SparkSpec {

  // Queries whose correct result may legitimately be empty at tiny scale.
  private val mayBeEmpty = Set[String]()

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("Caches.releaseAll unpersists registered carriers") {
    import org.apache.spark.storage.StorageLevel
    val df = Caches.register(spark.range(10).toDF("id").cache())
    df.count()
    assert(df.storageLevel != StorageLevel.NONE, "carrier was not cached")
    Caches.releaseAll()
    assert(df.storageLevel == StorageLevel.NONE,
      "releaseAll left the carrier persisted")
    Caches.releaseAll() // idempotent on an empty registry
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      // column names must be stable (oracle hash-compares by sorted name)
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names: ${df.columns.mkString(",")}")
    }
  }
}
