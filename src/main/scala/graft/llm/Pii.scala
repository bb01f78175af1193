package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: replace emails, IPv4 addresses, and
  * long digit runs (phone/account-number shaped) with typed placeholder
  * tokens, and count what was removed — the standard pre-training privacy
  * pass (placeholders keep token positions stable so downstream packing /
  * chunking manifests survive the scrub).
  *
  * Pure column expressions (codegen'd `regexp_replace`/`regexp_count`):
  * a narrow map over the scan, no shuffle, no UDF. Patterns are restricted
  * to the regex subset Java and RE2 interpret identically ([0-9] classes,
  * bounded repetition, \b) so the DuckDB oracle replays them bit-for-bit.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** 7+ digit runs: phone numbers, SSN-ish ids, account numbers. Applied
    * after [[Ipv4Re]] so octets never count twice. */
  val NumberRe = "\\b[0-9]{7,15}\\b"

  /** Add `redacted` plus per-kind counts to `df`. Counts are taken on the
    * progressively-redacted text (emails → IPs → digit runs), so a digit
    * run inside an IP inside an already-matched email is attributed to
    * exactly one kind.
    */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t0: Column = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, NumberRe, "<NUM>")
    df.withColumn("n_emails", regexp_count(t0, lit(EmailRe)).cast("long"))
      .withColumn("n_ips", regexp_count(t1, lit(Ipv4Re)).cast("long"))
      .withColumn("n_nums", regexp_count(t2, lit(NumberRe)).cast("long"))
      .withColumn("redacted", t3)
  }
}
