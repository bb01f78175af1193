package graft.llm

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redact(text: String) = {
    val r = Pii.redactPii(Seq((1L, text)).toDF("doc_id", "text")).collect()(0)
    (r.getAs[String]("redacted"), r.getAs[Long]("n_emails"),
      r.getAs[Long]("n_ips"), r.getAs[Long]("n_nums"))
  }

  test("emails, IPs, and digit runs are replaced with typed placeholders") {
    val (red, e, i, n) = redact(
      "Contact john.doe+spam@corp.example.org or 192.168.1.10, call 5551234567.")
    assert(red == "Contact <EMAIL> or <IP>, call <NUM>.")
    assert((e, i, n) == ((1L, 1L, 1L)))
  }

  test("IP octets are not double-counted as digit runs") {
    val (red, e, i, n) = redact("server 10.0.0.1 uptime 99887766 seconds")
    assert(red == "server <IP> uptime <NUM> seconds")
    assert((e, i, n) == ((0L, 1L, 1L)))
  }

  test("clean text passes through untouched") {
    val (red, e, i, n) = redact("no private data here, just words and 42")
    assert(red == "no private data here, just words and 42")
    assert((e, i, n) == ((0L, 0L, 0L)))
  }

  test("short digit runs and bare dotted pairs are not PII") {
    val (red, e, i, n) = redact("version 1.2 build 123456")
    assert(red == "version 1.2 build 123456")
    assert((e, i, n) == ((0L, 0L, 0L)))
  }

  test("multiple matches of one kind all redact and count") {
    val (red, e, i, n) = redact("a@b.co then c@d.org")
    assert(red == "<EMAIL> then <EMAIL>")
    assert((e, i, n) == ((2L, 0L, 0L)))
  }

  test("redaction is a narrow plan: no exchange") {
    val df = Pii.redactPii(Seq((1L, "x")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redaction must not shuffle:\n$plan")
  }
}
