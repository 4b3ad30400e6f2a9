package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ES match-semantics variants: substring, token-exact, and the Lucene
  * standard-analyzer-faithful form (lowercase + non-alnum tokenize). */
class ServingMatchSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    (1L, "Small ring."),        // punctuated, capitalized
    (2L, "small polished ring"),
    (3L, "boring smallish band"), // substring-only hits
    (4L, "SMALL RING"),
    (5L, "ring"))
    .toDF("id", "name")

  private def ids(c: org.apache.spark.sql.Column): Set[Long] =
    fixtures.where(c).select("id").collect().map(_.getLong(0)).toSet

  test("analyzed match is case- and punctuation-insensitive, token-exact") {
    assert(ids(Serving.matchAllTokensAnalyzed(col("name"), "small ring")) ==
      Set(1L, 2L, 4L))
    // query side is analyzed too
    assert(ids(Serving.matchAllTokensAnalyzed(col("name"), "SMALL, Ring.")) ==
      Set(1L, 2L, 4L))
    // "ring" does NOT hit "boring" under analyzed semantics
    assert(ids(Serving.matchAllTokensAnalyzed(col("name"), "ring")) ==
      Set(1L, 2L, 4L, 5L))
  }

  test("all match variants reject an empty/blank query loudly") {
    // ''.split yields [''] and contains('') is always true — unguarded,
    // an empty itemName would silently become match-everything and a
    // serving endpoint would aggregate the whole fact table
    for (bad <- Seq("", "   ")) {
      intercept[IllegalArgumentException](Serving.matchAll(col("name"), bad))
      intercept[IllegalArgumentException](
        Serving.matchAllTokens(col("name"), bad))
      intercept[IllegalArgumentException](Serving.highlightPattern(bad))
    }
    intercept[IllegalArgumentException](
      Serving.matchAllTokensAnalyzed(col("name"), " ,. "))
  }

  test("token-exact (non-analyzed) match misses punctuated/cased variants") {
    // "Small ring." tokenizes to ["Small","ring."] — neither equals the
    // lowercase query tokens, and "SMALL RING" is case-mismatched
    assert(ids(Serving.matchAllTokens(col("name"), "small ring")) == Set(2L))
  }

  test("substring match over-matches (documented approximation)") {
    // id3 "boring smallish band" contains both "small" and "ring" as
    // substrings — exactly the over-match the analyzed form fixes
    assert(ids(Serving.matchAll(col("name"), "small ring")) == Set(2L, 3L))
    assert(ids(Serving.matchAll(col("name"), "ring")) ==
      Set(1L, 2L, 3L, 5L)) // "boring" hits
  }
}
