package graft

import graft.functions.Redact
import org.apache.spark.sql.functions._

/** PII redaction fixtures: detection, ordering (email consumes its own
  * digits), idempotence, and the no-PII fast path. */
class RedactSpec extends GraftSuite {

  private def run(texts: String*): Seq[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(Redact.redact(col("text")).as("red"),
        Redact.piiCounts(col("text")).as("c"))
      .select(col("red"), col("c.email"), col("c.ssn"), col("c.ip"), col("c.phone"))
      .as[(String, Long, Long, Long, Long)].collect().toIndexedSeq
  }

  test("each rule detects and redacts its shape") {
    val got = run(
      "contact jane.doe+x@example.co.uk for details",
      "ssn is 123-45-6789 ok",
      "server at 10.0.255.7 responded",
      "call (415) 555-2671 or +1 415 555 2671 today")
    assert(got(0) == ("contact <EMAIL> for details", 1L, 0L, 0L, 0L))
    assert(got(1) == ("ssn is <SSN> ok", 0L, 1L, 0L, 0L))
    assert(got(2) == ("server at <IP> responded", 0L, 0L, 1L, 0L))
    assert(got(3)._1 == "call <PHONE> or <PHONE> today" && got(3)._5 == 2L)
  }

  test("a span consumed by an earlier rule is not double-counted") {
    // the address's digits would otherwise look SSN/phone-shaped
    val got = run("mail 123-45-6789@digits.example.com now")
    assert(got.head == ("mail <EMAIL> now", 1L, 0L, 0L, 0L))
  }

  test("redaction is idempotent and clean text passes through untouched") {
    import spark.implicits._
    val texts = Seq(
      "contact jane@example.com or 10.1.2.3",
      "perfectly clean prose with words only")
    val once = texts.toDF("text").select(Redact.redact(col("text")).as("r"))
      .as[String].collect().toSeq
    val twice = once.toDF("text").select(Redact.redact(col("text")).as("r"))
      .as[String].collect().toSeq
    assert(once == twice)
    assert(once(1) == texts(1))
    val totals = texts.toDF("text")
      .select(Redact.piiTotal(col("text")).as("t")).as[Long].collect().toSeq
    assert(totals == Seq(2L, 0L))
  }
}
