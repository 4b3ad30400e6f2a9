package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{CosineSimilarity, GramHashes, Int8Quantize, MinHashSig, ShingleSet, SimHashSig}

/** SQL surface for the engine's native expressions, registered through
  * the standard `SparkSessionExtensions` mechanism so `spark.sql(...)`
  * and the function registry see them like built-ins:
  *
  *   spark.sql.extensions=graft.GraftExtensions   (GraftSession sets it)
  *
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  *   SELECT shingle_set(text, 3), minhash_sig(text, 3, 16) FROM docs
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("int8_quantize"),
      new ExpressionInfo(classOf[Int8Quantize].getName, "int8_quantize"),
      (args: Seq[Expression]) => Int8Quantize(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (args: Seq[Expression]) =>
        ShingleSet(args(0), intArg(args(1), "shingle_set"))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        intArg(args(1), "minhash_sig"), intArg(args(2), "minhash_sig"))))
    ext.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (args: Seq[Expression]) =>
        SimHashSig(args(0), intArg(args(1), "simhash_sig"))))
    ext.injectFunction((
      new FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
      (args: Seq[Expression]) =>
        GramHashes(args(0), intArg(args(1), "gram_hashes"))))
  }
}
