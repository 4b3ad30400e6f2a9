package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for epoch-keyed streaming sinks.
  *
  * Micro-batch sinks produce one directory (and ≥1 file) per epoch; at a
  * 5 s trigger that is ~17k directories/day/topic — death by file
  * listing long before the data is big. Compaction rewrites a topic
  * directory into `targetPartitions` files and atomically swaps it in,
  * dropping the `epoch` partition column (it was a sink-idempotence
  * artifact, not data). Run it out-of-band (the streaming writer keeps
  * appending new epochs while old ones are being compacted only if the
  * swap is coordinated — here: stop-the-world swap, the simple variant).
  */
object Compact {

  def compactEpochs(spark: SparkSession, dir: String,
      targetPartitions: Int = 1): Unit = {
    graft.AtomicSwap.recover(dir)
    val df = spark.read.parquet(dir)
    val cleaned =
      if (df.columns.contains("epoch")) df.drop("epoch") else df
    val tmp = s"$dir.compact.tmp"
    cleaned.repartition(targetPartitions).write
      .mode("overwrite").parquet(tmp)
    graft.AtomicSwap.publish(tmp, dir)
  }
}
