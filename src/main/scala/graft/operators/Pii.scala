package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII detection and redaction over `documents` — the privacy-scrub
  * stage every production training-data pipeline runs between quality
  * filtering and packing (the Dolma and FineWeb pipelines both ship
  * regex-based email/phone/IP scrubbing as a core curation step; no
  * analog in the reference, which never handles free text).
  *
  * Both passes are MAP-ONLY: one codegen'd regexp pass per pattern over
  * the text column, no shuffle, no UDF — the 100 TB cost is exactly one
  * corpus scan, and the patterns are anchored to the leftmost-first
  * greedy semantics Java regex and RE2/DuckDB share (no lookarounds, no
  * backreferences — RE2 has neither, so staying inside the common
  * subset keeps the DuckDB oracle bit-identical).
  *
  * Redaction order is load-bearing and fixed: EMAIL → IPV4 → PHONE.
  * Emails first (their local parts may contain digit runs a later
  * pattern could bite into), IPv4 before the generic phone shape (a
  * dotted quad is a digit run the phone pattern would otherwise
  * partially consume). Both engines apply the same three replacements
  * in the same order, so the composition — not just each pattern — is
  * parity-checked. */
object Pii {

  /** Email, the common-subset shape: local@domain.tld, tld ≥ 2 alpha. */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  /** Dotted-quad IPv4, word-bounded so version strings ("1.2.3.4000")
    * don't half-match. (Octet range-checking needs backtracking tricks
    * outside the RE2 subset; a 999 "octet" is still worth scrubbing.) */
  val Ipv4Re = """\b(?:\d{1,3}\.){3}\d{1,3}\b"""

  /** NANP-ish phone: optional +CC prefix, then (3) 3 4 digit groups
    * with -, ., space or parens between. Deliberately loose (a bare
    * 10-digit run matches — a redactor errs toward scrubbing); dotted
    * quads stay safe because no IPv4 octet run reaches the trailing
    * \d{4}. */
  val PhoneRe =
    """(?:\+?\d{1,3}[-. ]*)?\(?\d{3}\)?[-. ]*\d{3}[-. ]*\d{4}"""

  val EmailTag = "|||EMAIL|||"
  val Ipv4Tag  = "|||IP|||"
  val PhoneTag = "|||PHONE|||"

  /** Per-document PII inventory: match counts per category plus the
    * has_pii routing flag (the curation gate reads only the flag; the
    * counts feed audit rollups). One scan, zero shuffles. */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ipv4"),
        regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phone"))
      .withColumn("has_pii",
        (col("n_email") + col("n_ipv4") + col("n_phone") > 0)
          .cast("int"))
      .orderBy("doc_id")

  /** The scrub itself: every match replaced by its category tag, fixed
    * EMAIL → IPV4 → PHONE order (see object scaladoc). Tags rather than
    * deletion — downstream token accounting still sees one token where
    * the PII was, and audits can count scrubbed sites post hoc. */
  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit(EmailTag)),
        lit(Ipv4Re), lit(Ipv4Tag)),
      lit(PhoneRe), lit(PhoneTag))

  /** Corpus-wide redaction pass: (doc_id, clean_text). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), redactText(col("text")).as("clean_text"))
      .orderBy("doc_id")
}
