package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-PII behavior pin for [[Pii]]: the synthetic corpus carries no
  * PII (q76/q77 gate the identity pass corpus-wide), so the operator
  * semantics — match counting, tag substitution, replacement order —
  * are pinned here on literal rows. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scan(text: String) = {
    val r = Seq((1L, text)).toDF("doc_id", "text")
      .select(
        regexp_count(col("text"), lit(Pii.EmailRe)).as("e"),
        regexp_count(col("text"), lit(Pii.Ipv4Re)).as("i"),
        regexp_count(col("text"), lit(Pii.PhoneRe)).as("p"))
      .head
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  private def redact(text: String): String =
    Seq((1L, text)).toDF("doc_id", "text")
      .select(Pii.redactText(col("text"))).head.getString(0)

  test("scan counts each category independently") {
    assert(scan("mail a@b.co and c.d+x@e-f.org twice") == (2, 0, 0))
    assert(scan("hosts 10.0.0.1 and 192.168.255.254") == (0, 2, 0))
    assert(scan("call +1-555-123-4567 or (555) 123 4567") == (0, 0, 2))
    assert(scan("bare 555-123-4567 no country code") == (0, 0, 1))
    assert(scan("ips 10.0.0.1 192.168.255.254 are not phones") == (0, 2, 0))
    assert(scan("clean text with no identifiers at all") == (0, 0, 0))
  }

  test("redaction replaces every occurrence with the category tag") {
    assert(redact("mail a@b.co or c@d.org now") ==
      "mail |||EMAIL||| or |||EMAIL||| now")
    assert(redact("from 10.0.0.1 dial +1-555-123-4567") ==
      "from |||IP||| dial |||PHONE|||")
    assert(redact("nothing to scrub here") == "nothing to scrub here")
  }

  test("replacement order protects emails and IPs from the phone pattern") {
    // digit-heavy email local part and a dotted quad: if the loose phone
    // pattern ran first it would bite into both; the fixed EMAIL → IPV4
    // → PHONE order must leave exactly one tag per true entity
    assert(redact("5551234567@mail.com") == "|||EMAIL|||")
    assert(redact("10.20.30.40") == "|||IP|||")
  }

  test("ipv4 word boundary refuses version-string half-matches") {
    // 1.2.3.4000: \b after the last octet cannot land inside the digit
    // run, so the dotted quad must NOT be redacted as an IP
    assert(!redact("v1.2.3.4000 release").contains(Pii.Ipv4Tag))
    assert(redact("at 1.2.3.4 port").contains(Pii.Ipv4Tag))
  }

  test("corpus scan and redaction are the identity on PII-free docs") {
    val sf = "/root/testdata/sf0.001"
    val s = Pii.piiScan(spark, sf)
    assert(s.where(col("has_pii") =!= 0).isEmpty)
    val changed = Pii.piiRedact(spark, sf)
      .join(graft.Tables.documents(spark, sf), "doc_id")
      .where(col("clean_text") =!= col("text"))
    assert(changed.isEmpty)
  }
}
