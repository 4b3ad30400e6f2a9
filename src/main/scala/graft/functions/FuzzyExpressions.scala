// Lives under org.apache.spark.sql so it can use private[sql] APIs —
// same pattern as TextExpressions/VectorExpressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Candidate-generation kernels for the edit-distance fuzzy join
  * (`graft.operators.FuzzyJoin`). Both emit 64-bit CANDIDATE KEYS that
  * never leave the join machinery — every candidate pair is re-verified
  * with an exact `levenshtein` — so a hash collision can only create a
  * spurious candidate (harmless), never lose a true match: the
  * filters stay strict supersets of the answer.
  *
  * Both kernels work on CODEPOINTS (decoded from the UTF-8 lead bytes),
  * matching the unit `levenshtein` edits in: one edit touches one
  * codepoint, so the q-gram destruction bound (≤ q grams per edit) and
  * the deletion-variant argument hold for any Unicode content.
  */
private[graft] object FuzzyKernel {
  /** Codepoints of a UTF8String without going through String. */
  def codepoints(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val (cp, len) =
        if (b < 0x80) (b, 1)
        else if (b < 0xe0) (((b & 0x1f) << 6) | (bytes(i + 1) & 0x3f), 2)
        else if (b < 0xf0)
          (((b & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6)
            | (bytes(i + 2) & 0x3f), 3)
        else
          (((b & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12)
            | ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f), 4)
      out(n) = cp; n += 1; i += len
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** 64-bit poly hash of cp[from, from+len). */
  def polyHash(cp: Array[Int], from: Int, len: Int): Long = {
    var h = 1125899906842597L
    var i = from
    val end = from + len
    while (i < end) { h = h * 31 + cp(i); i += 1 }
    h
  }
}

/** Tagged q-gram candidate keys: one Long per q-gram OCCURRENCE of the
  * string — poly-hash of the gram's codepoints, mixed with the gram's
  * occurrence ordinal within this string. The ordinal tag turns the
  * gram MULTISET into a set (the i-th copy of a repeated gram matches
  * the i-th copy on the other side), which is what the ED-Join overlap
  * bound counts: one codepoint edit destroys at most q gram
  * occurrences, so strings within edit distance k share all but ≤ k·q
  * tagged grams. Strings shorter than q codepoints emit one whole-string
  * key (only the fuzzy join's SHORT path ever sees those rows). */
case class TaggedQGramHashes(child: Expression, q: Int)
    extends UnaryExpression with CodegenFallback {
  require(q >= 2, s"gram size must be >= 2 (got $q)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "tagged_qgram_hashes"
  override def nullSafeEval(input: Any): Any = {
    val cp = FuzzyKernel.codepoints(input.asInstanceOf[UTF8String].getBytes)
    val n = cp.length - q + 1
    if (n <= 0)
      new GenericArrayData(
        Array(FuzzyKernel.polyHash(cp, 0, cp.length)))
    else {
      val occ = new java.util.HashMap[java.lang.Long, Integer](n * 2)
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val h = FuzzyKernel.polyHash(cp, i, q)
        val seen = occ.merge(h, 1, (a, b) => a + b)
        out(i) = h + (seen.toLong - 1) * 0x9e3779b97f4a7c15L
        i += 1
      }
      new GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(c: Expression)
      : TaggedQGramHashes = copy(child = c)
}

/** SymSpell deletion-neighborhood keys: the poly-hashes of every
  * DISTINCT string reachable by deleting at most `k` codepoints
  * (including the string itself). Two strings within edit distance k
  * always share a variant (delete the edited positions from each side),
  * so joining on these keys is a complete candidate filter for short
  * strings, where the q-gram overlap bound is vacuous. Fan-out is
  * Σ C(n,i), i ≤ k — the fuzzy join only routes strings of bounded
  * length here, keeping it a small constant (≤ 67 for n ≤ 10, k = 2). */
case class DeletionNeighborhood(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"deletion budget must be >= 1 (got $k)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_neighborhood"
  override def nullSafeEval(input: Any): Any = {
    val cp = FuzzyKernel.codepoints(input.asInstanceOf[UTF8String].getBytes)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val buf = new Array[Int](cp.length)
    // choose up to k positions to drop, lexicographically (from > last
    // chosen position), hashing the surviving codepoints
    def emit(dropped: Array[Int], nDropped: Int): Unit = {
      var m = 0
      var i = 0
      var d = 0
      while (i < cp.length) {
        if (d < nDropped && dropped(d) == i) d += 1
        else { buf(m) = cp(i); m += 1 }
        i += 1
      }
      seen.add(FuzzyKernel.polyHash(buf, 0, m))
    }
    val dropped = new Array[Int](k)
    def rec(depth: Int, from: Int): Unit = {
      emit(dropped, depth)
      if (depth < k) {
        var p = from
        while (p < cp.length) {
          dropped(depth) = p
          rec(depth + 1, p + 1)
          p += 1
        }
      }
    }
    rec(0, 0)
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression)
      : DeletionNeighborhood = copy(child = c)
}

object FuzzyExpressions {
  def taggedQGramHashes(text: Column, q: Int): Column =
    ExpressionUtils.column(
      TaggedQGramHashes(ExpressionUtils.expression(text), q))
  def deletionNeighborhood(text: Column, k: Int): Column =
    ExpressionUtils.column(
      DeletionNeighborhood(ExpressionUtils.expression(text), k))
}
