package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline operators
  * (tokenize / language-ID / quality / fingerprint). All built from
  * codegen'd `org.apache.spark.sql.functions` — no UDFs — so they inline
  * into whole-stage codegen and push work to the scan.
  */
object TextFunctions {

  /** Engine-stable decimal rounding of a double: floor(x·10^d + 0.5) /
    * 10^d. `round()` is NOT engine-stable — Spark HALF_UPs the shortest
    * decimal repr while DuckDB rounds the binary double, and at a half
    * boundary they differ in the last digit (bit-identical inputs of
    * 96680292.225 rounded to .23 vs .22 at sf1). Multiply, add, floor,
    * divide are all IEEE-deterministic, so this rule yields the SAME
    * bits on every engine given the same input bits. Positive inputs
    * only (floor+0.5 is round-half-down for negatives). */
  def roundStable(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Order-independent money sum: each row's amount becomes EXACT
    * integer cents via the stable floor rule (per-row doubles are
    * bit-equal across engines — a product or a stored value, no
    * accumulation), the cents sum as Longs (associative — partial
    * aggregation order cannot change the result, unlike a double SUM,
    * whose last ulp depends on add order and flipped a rounded digit
    * at sf1), and ONE final division yields the 2-decimal value.
    * Headroom: Long cents overflow at ~9·10¹⁶ currency units. */
  def moneySum(amount: Column): Column =
    sum(floor(amount * lit(100.0) + lit(0.5))).cast("double") / lit(100.0)

  /** Whitespace tokens (empty tokens filtered). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: alpha runs, digit runs, or single symbols —
    * a cheap proxy for tokenizer load when budgeting 100 TB of text. */
  def subTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Tiny deterministic English stopword list for langid/quality. */
  val enStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "on", "for")

  /** Fraction of tokens that are English stopwords (0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(enStopwords: _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** n-gram-heuristic language ID: stopword-ratio thresholding — the
    * classic cheap filter before a real classifier in data pipelines. */
  def langGuess(text: Column): Column =
    when(stopwordRatio(text) >= 0.05, "en").otherwise("unknown")

  /** Punctuation-character ratio over non-space characters. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s+", ""))
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(nonSpace === 0, lit(0.0))
      .otherwise(punct.cast("double") / nonSpace.cast("double"))
  }

  /** Mean token length (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double")
          / size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: token-count band + stopword presence
    * − punctuation penalty. Deterministic, SQL-replicable.
    *
    * Shape matters (same trap as [[minHashSignature]]): composing
    * `tokenCount + stopwordRatio + punctRatio` as separate Columns inlines
    * the tokenization subtree ~6 times — Catalyst does no CSE inside an
    * expression tree. Here everything rides ONE `aggregate` fold: the
    * token array is the fold input (split runs once), the two char-level
    * regex counts ride in the zero struct (each runs once), and the finish
    * lambda derives the score from the accumulator — lambda-variable
    * references are bound values, not re-executed subtrees. Net: one
    * tokenization + two regex passes per doc, period. */
  def qualityScore(text: Column): Column =
    // null text: the fold would null-propagate, but the pre-fold form
    // fell through every `when` to its otherwise and scored
    // 0.0 + 0.0 + 0.2 + 0.0 — keep that contract (and the [0,1] range)
    when(text.isNull, lit(0.2)).otherwise(aggregate(
      tokens(text),
      struct(lit(0L).as("n"), lit(0L).as("nstop"),
        length(regexp_replace(text, "\\s+", "")).cast("long").as("nonspace"),
        length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("long").as("npunct")),
      (acc, t) => struct(
        (acc.getField("n") + lit(1L)).as("n"),
        (acc.getField("nstop") +
          when(t.isin(enStopwords: _*), lit(1L)).otherwise(lit(0L))).as("nstop"),
        acc.getField("nonspace").as("nonspace"),
        acc.getField("npunct").as("npunct")),
      acc => {
        val n = acc.getField("n")
        // identical arithmetic (operand values AND order) to the split-out
        // stopwordRatio/punctRatio forms, so q20/q50 oracles stay bitwise
        val stopRaw = when(n === 0, lit(0.0))
          .otherwise(acc.getField("nstop").cast("double") / n.cast("double"))
        val punctRaw = when(acc.getField("nonspace") === 0, lit(0.0))
          .otherwise(acc.getField("npunct").cast("double") /
            acc.getField("nonspace").cast("double"))
        val lenScore = when(n >= 20 && n <= 1000, lit(0.5))
          .when(n >= 5, lit(0.25)).otherwise(lit(0.0))
        val stopScore = when(stopRaw >= 0.05, lit(0.3)).otherwise(lit(0.0))
        val punctPenalty = when(punctRaw > 0.2, lit(-0.2)).otherwise(lit(0.0))
        roundStable(lenScore + stopScore + lit(0.2) + punctPenalty, 2)
      }))

  /** Canonical-form document fingerprint: md5 of lowercased,
    * whitespace-collapsed text — exact-dedup key that survives trivial
    * formatting differences. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** First 60 bits of md5(s) as a non-negative Long — the shared
    * deterministic string→int hash for minhash/simhash (15 hex chars keeps
    * it inside a signed 64-bit int; replicable in any SQL engine). */
  def md5Long(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Word k-shingles of the token stream (for minhash over shingles).
    *
    * REFERENCE TWIN ONLY (the hot paths use the native
    * `TextExpressions.shingleSet` / `MinHashSig` kernels): the transform
    * lambda embeds the tokens() EXPRESSION, so `slice` re-tokenizes the
    * document once per shingle element — O(n²) in document length. A
    * caller on a hot path must materialize the token array as an
    * attribute behind its own projection first (see
    * `Dedup.duplicateSpansOn` for the pattern and the measured 2.3×). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n < k, array(concat_ws(" ", toks)))
      .otherwise(
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Mersenne prime 2^31−1: the affine-rehash modulus for minhash. */
  val MinHashP: Long = 2147483647L

  /** First 60 bits of md5(s) as a Long — Scala-side twin of [[md5Long]]
    * for deriving plan-time constants. */
  def md5LongScala(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
  }

  /** Per-permutation affine constants h_j(x) = (a_j·x + b_j) mod P.
    * a_j, b_j are md5-derived (deterministic, reproducible in any engine
    * as literals). They MUST be independent large randoms: a correlated
    * family like a_j = 2j+1 is not min-wise independent — small base
    * hashes never wrap mod P, every permutation picks the same argmin,
    * and unrelated docs collide with high estimated similarity. */
  def minHashA(numHashes: Int): IndexedSeq[Long] =
    (0 until numHashes).map(j => md5LongScala(s"minhash-a:$j") % (MinHashP - 1) + 1)
  def minHashB(numHashes: Int): IndexedSeq[Long] =
    (0 until numHashes).map(j => md5LongScala(s"minhash-b:$j") % MinHashP)

  /** MinHash signature as ONE fold: digest each distinct shingle once
    * (md5 mod P), then fold the base hashes through an array of numHashes
    * running minimums, where permutation j applies the affine rehash
    * h_j(x) = ((2j+1)·x + 98765j) mod P — the standard cheap-rehash
    * scheme, pure integer math any SQL engine reproduces exactly.
    *
    * Shape matters: a naive transform(seq(j), min(transform(bases, …)))
    * re-evaluates the bases subtree (and so the md5s) once per
    * permutation — Catalyst does no CSE inside an expression tree, and
    * CollapseProject folds a separate bases projection right back in.
    * The single `aggregate` below references the digest subtree exactly
    * once, so each shingle is hashed exactly once per row regardless of
    * numHashes. Returns array<long>. */
  def minHashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val aArr = array(minHashA(numHashes).map(lit): _*)
    val bArr = array(minHashB(numHashes).map(lit): _*)
    aggregate(
      transform(array_distinct(shingles(text, k)), s => md5Long(s) % MinHashP),
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (m, j) => least(m,
          (element_at(aArr, j + 1) * h + element_at(bArr, j + 1)) % MinHashP)))
  }

  /** 32-bit SimHash over distinct tokens: bit i of the signature is 1 iff
    * the majority of token hashes have bit i set (ties → 0).
    * Bit masks are built with pow(2, i) — exact in a double for i < 53 and
    * replicable verbatim in the SQL oracle. */
  def simHash(text: Column, bits: Int = 32): Column = {
    val hashes = transform(tokenSet(text), t => md5Long(t))
    val n = size(hashes)
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, i) => {
        val mask = pow(lit(2.0), i).cast("long")
        val ones = size(filter(hashes, h => h.bitwiseAND(mask) =!= 0L))
        acc + when(ones * 2 > n, mask).otherwise(lit(0L))
      })
  }
}
