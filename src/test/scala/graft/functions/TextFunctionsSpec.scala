package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import TextFunctions._

/** Unit semantics of the text column functions on literal rows. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c).collect()(0).getAs[T](0)

  test("tokens split on whitespace and drop empties") {
    val r = Seq("  the  quick\tfox ").toDF("t")
      .select(tokens(col("t"))).collect()(0).getSeq[String](0)
    assert(r == Seq("the", "quick", "fox"))
  }

  test("qualityScore: single-fold form scores a known doc and null text") {
    // 25 tokens incl. stopwords, no punctuation: 0.5 + 0.3 + 0.2 = 1.0
    val good = ("the quick fox jumps over the lazy dog and then it runs " +
      "to the barn where it sleeps for a while on a warm pile of hay")
    val df = Seq(Option(good), Option.empty[String]).toDF("t")
      .select(qualityScore(col("t")).as("q")).collect()
    assert(df(0).getDouble(0) == 1.0)
    // null text keeps the pre-fold contract: every component falls
    // through to its otherwise → 0.0 + 0.0 + 0.2 + 0.0
    assert(!df(1).isNullAt(0) && df(1).getDouble(0) == 0.2)
  }

  test("tokenCount and subTokenCount") {
    val df = Seq("ab12 cd, ef!").toDF("t")
    assert(df.select(tokenCount(col("t"))).collect()(0).getInt(0) == 3)
    // ab|12, cd, ',', ef, '!' → 6 sub-tokens
    assert(df.select(subTokenCount(col("t"))).collect()(0).getInt(0) == 6)
  }

  test("stopwordRatio on empty and stopword-only docs") {
    assert(Seq("").toDF("t").select(stopwordRatio(col("t")))
      .collect()(0).getDouble(0) == 0.0)
    assert(Seq("the of to").toDF("t").select(stopwordRatio(col("t")))
      .collect()(0).getDouble(0) == 1.0)
  }

  test("fingerprint is whitespace/case invariant") {
    val df = Seq(("Hello  World", "hello world")).toDF("a", "b")
    val r = df.select(fingerprint(col("a")), fingerprint(col("b"))).collect()(0)
    assert(r.getString(0) == r.getString(1))
  }

  test("shingles: k=3 over 5 tokens gives 3 shingles; short doc gives whole text") {
    val r = Seq("a b c d e").toDF("t")
      .select(shingles(col("t"), 3)).collect()(0).getSeq[String](0)
    assert(r == Seq("a b c", "b c d", "c d e"))
    val short = Seq("a b").toDF("t")
      .select(shingles(col("t"), 3)).collect()(0).getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("minHashSignature: identical docs agree, length = numHashes") {
    val df = Seq(("x y z w v", "x y z w v", "p q r s t")).toDF("a", "b", "c")
    val r = df.select(
      minHashSignature(col("a"), 3, 16),
      minHashSignature(col("b"), 3, 16),
      minHashSignature(col("c"), 3, 16)).collect()(0)
    val (sa, sb, sc2) =
      (r.getSeq[Long](0), r.getSeq[Long](1), r.getSeq[Long](2))
    assert(sa.length == 16 && sa == sb && sa != sc2)
    assert(sa.forall(v => v >= 0 && v < MinHashP))
  }

  test("simHash: identical docs agree; 32-bit range") {
    val df = Seq(("x y z", "x y z")).toDF("a", "b")
    val r = df.select(simHash(col("a")), simHash(col("b"))).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << 32))
  }

  test("langGuess flags stopword-rich text as en") {
    val df = Seq(("the cat sat on the mat", "xq zv plk")).toDF("a", "b")
    val r = df.select(langGuess(col("a")), langGuess(col("b"))).collect()(0)
    assert(r.getString(0) == "en" && r.getString(1) == "unknown")
  }
}
