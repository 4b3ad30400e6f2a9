package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * All math is done in Double via a *sequential left fold*
  * (`aggregate(zip_with(...))`) — positional order, so the result is
  * bitwise-deterministic and reproducible by any engine that folds the
  * list in order (the DuckDB oracle uses list_reduce the same way).
  * Everything stays inside codegen'd higher-order functions — no UDFs.
  */
object VectorFunctions {

  private def fold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column =
    sqrt(fold(transform(a, x => x.cast("double") * x.cast("double"))))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
