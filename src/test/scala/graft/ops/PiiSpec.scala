package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-pinned semantics of the PII redaction pipeline — the same
  * positives/negatives the portable regex dialect was frozen against
  * (each expectation was independently confirmed on DuckDB's RE2
  * before commit, so this spec pins the JVM half of the parity the
  * t_pii_redact oracle checks end-to-end). */
class PiiSpec extends AnyFunSuite with SparkSpec {

  private def run(texts: Seq[String]) = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Pii.redactPii(df, $"doc_id", $"text").orderBy($"doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
  }

  test("detectors: counts and redactions on known placements") {
    val got = run(Seq(
      "reach me at user42@ex3.example.com ok",
      "call +1 (202) 555-0147 today",
      "server at 10.3.21.45 up",
      "dial 303-555.0101 and mail a.b+tag@x.co",
      "no pii here just words"))
    // (n_emails, n_ips, n_phones, n_pii, redacted)
    assert(got(0) == ((1L, 0L, 0L, 1L, "reach me at <EMAIL> ok")))
    assert(got(1) == ((0L, 0L, 1L, 1L, "call <PHONE> today")))
    assert(got(2) == ((0L, 1L, 0L, 1L, "server at <IP> up")))
    assert(got(3) == ((1L, 0L, 1L, 2L, "dial <PHONE> and mail <EMAIL>")))
    assert(got(4) == ((0L, 0L, 0L, 0L, "no pii here just words")))
  }

  test("edges: version strings, octet overflow, multiple phones, boundaries") {
    val got = run(Seq(
      "v1.2.3 release not ip, but 1.2.3.4 is",
      "edge a@b.c x@y.zz 999.999.999.999",
      "(555) 123-4567 and 555-123-4567 and +12 555.123.4567",
      "not phone 12-34-56 nor 1234-5678",
      "email.with.dots@sub.domain.example.org trailing"))
    assert(got(0) == ((0L, 1L, 0L, 1L, "v1.2.3 release not ip, but <IP> is")))
    // a@b.c fails the 2-letter TLD; 999.* over-masks by design
    assert(got(1) == ((1L, 1L, 0L, 2L, "edge a@b.c <EMAIL> <IP>")))
    assert(got(2) == ((0L, 0L, 3L, 3L, "<PHONE> and <PHONE> and <PHONE>")))
    assert(got(3) == ((0L, 0L, 0L, 0L, "not phone 12-34-56 nor 1234-5678")))
    assert(got(4) == ((1L, 0L, 0L, 1L, "<EMAIL> trailing")))
  }

  test("staging order: alpha-TLD host redacts as ONE email, IP-literal host as an IP") {
    // user@mail10.0.0.example.com: the whole dotted host (digits included)
    // sits inside the email match — the IP stage sees nothing
    val got = run(Seq(
      "user@mail10.0.0.example.com up",
      "admin@10.0.0.1 logged in from 10.0.0.2"))
    assert(got(0) == ((1L, 0L, 0L, 1L, "<EMAIL> up")))
    // IP-literal hosts are OUTSIDE the email shape (no alpha TLD) by
    // design, so the quad redacts as an IP — DuckDB RE2 confirmed equal
    assert(got(1) == ((0L, 2L, 0L, 2L, "admin@<IP> logged in from <IP>")))
  }

  test("planted corpus covers every detector and the no-PII case") {
    import spark.implicits._
    val docs = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val planted = docs.select($"doc_id", Pii.plantedPiiText($"doc_id", $"text").as("text"))
    val out = Pii.redactPii(planted, $"doc_id", $"text")
      .withColumn("m", pmod($"doc_id", lit(5)))
      .groupBy($"m").agg(
        sum($"n_emails").as("e"), sum($"n_ips").as("i"),
        sum($"n_phones").as("p"), count(lit(1)).as("n"))
      .orderBy($"m").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byM = out.map(t => t._1 -> t).toMap
    assert(byM(0L)._2 == byM(0L)._5 && byM(0L)._3 == 0 && byM(0L)._4 == 0) // email-only
    assert(byM(1L)._4 == byM(1L)._5 && byM(1L)._2 == 0 && byM(1L)._3 == 0) // phone-only
    assert(byM(2L)._3 == byM(2L)._5 && byM(2L)._2 == 0 && byM(2L)._4 == 0) // ip-only
    assert(byM(3L)._2 == byM(3L)._5 && byM(3L)._4 == byM(3L)._5)           // email+phone
    assert(byM(4L)._2 == 0 && byM(4L)._3 == 0 && byM(4L)._4 == 0)          // untouched
  }
}
