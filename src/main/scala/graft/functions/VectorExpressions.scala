// Lives under org.apache.spark.sql so it can use the private[sql]
// Expression APIs (AbstractDataType, classic.ExpressionUtils) — the
// standard pattern for extension libraries that add native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over `array<float>`
  * or `array<double>` (each side independently — IVF compares float
  * embeddings against exact-double centroids).
  *
  * The composed form (`aggregate(zip_with(..))` in [[VectorFunctions]])
  * is correct but interpreted: every element goes through a lambda-bound
  * HigherOrderFunction that blocks whole-stage codegen. This expression
  * emits a tight primitive loop into generated Java instead — no per-
  * element boxing, stays inside the codegen stage — which is the path a
  * 100 TB ANN scan actually needs. Preference order per the build notes:
  * compose built-ins (done) → custom Expression (this) → custom operator.
  *
  * Accumulation is ascending-index double adds, EXACTLY the same fold
  * order as the composed form and the DuckDB oracle's list_reduce —
  * results are bitwise identical, so both implementations verify against
  * the same oracle. (float→double widening is exact, so a float array
  * and its double widening produce identical results.)
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType),
      ArrayType(LongType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType),
      ArrayType(LongType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  // element accessor kind per side: long (int8-quantized carriers, see
  // Int8Quantize — products ≤ 127²·dim are exactly representable in the
  // double accumulator, so the integer path is bitwise-reproducible too)
  // / double (exact centroids) / float (stored embeddings)
  private def elem(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t               => t
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
      case DoubleType => arr.getDouble(i)
      case LongType   => arr.getLong(i).toDouble
      case _          => arr.getFloat(i).toDouble
    }
    val (xt, yt) = (elem(left), elem(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = get(x, i, xt)
      val yi = get(y, i, yt)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      def get(arr: String, idx: String, t: DataType): String = t match {
        case DoubleType => s"$arr.getDouble($idx)"
        case LongType   => s"(double) $arr.getLong($idx)"
        case _          => s"(double) $arr.getFloat($idx)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = ${get(a, i, elem(left))};
         |  double $yi = ${get(b, i, elem(right))};
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Per-vector symmetric int8 quantization: `qᵢ = floor(vᵢ · 127/max|v|)`
  * as `array<long>` (the storage layer would cast to bytes — 4× smaller
  * than float32; the long carrier keeps oracle/BIGINT parity).
  *
  * A native expression rather than `transform(...)` because the scale
  * `127/max|v|` must be computed ONCE per vector: Catalyst performs no
  * CSE inside an expression tree and CollapseProject inlines
  * single-referenced aliases into lambdas, so the composed form re-folds
  * the max-abs reduction PER ELEMENT — O(dim²) per row. Two tight loops
  * here (max-abs, then quantize), inside whole-stage codegen.
  *
  * Determinism: each output is one widen + one multiply + one floor on
  * identical operands (the division happens once per vector, exactly as
  * the oracle's `127.0 / list_reduce(...)` subexpression), so results
  * are bitwise identical in DuckDB. A zero vector quantizes to zeros
  * (the scale would be ∞ — guarded, not NaN-propagated). */
case class Int8Quantize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val out = new Array[Long](n)
    if (maxAbs > 0.0) {
      val scale = 127.0 / maxAbs
      i = 0
      while (i < n) {
        out(i) = math.floor(x.getFloat(i).toDouble * scale).toLong
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs"); val v = ctx.freshName("v")
      val scale = ctx.freshName("scale"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($v > $maxAbs) $maxAbs = $v;
         |}
         |long[] $out = new long[$n];
         |if ($maxAbs > 0.0) {
         |  double $scale = 127.0 / $maxAbs;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (long) java.lang.Math.floor(
         |      (double) $a.getFloat($i) * $scale);
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Int8Quantize = copy(child = newChild)
}

object VectorExpressions {
  /** Column API for the native cosine expression. */
  def cosineNative(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for the native int8 quantizer. */
  def int8QuantizeNative(a: Column): Column =
    ExpressionUtils.column(Int8Quantize(ExpressionUtils.expression(a)))
}
