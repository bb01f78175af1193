package graft.llm

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val v1 = Seq(
    (1L, "alpha text"), (2L, "beta text"), (3L, "gamma text"),
    (4L, "delta  TEXT")).toDF("doc_id", "text")
  private lazy val v2 = Seq(
    (1L, "alpha text"),       // unchanged
    (2L, "beta text edited"), // changed
    (4L, "Delta text"),       // unchanged: fingerprint case/space-folds
    (5L, "epsilon new"))      // added; doc 3 removed
    .toDF("doc_id", "text")

  test("statuses: added / removed / changed / format-insensitive unchanged") {
    val got = CorpusPrep.corpusDiff(v1, v2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("prepared-corpus fp column short-circuits the text read") {
    val o = v1.withColumn("fp",
      TextAnalysis.fingerprint(org.apache.spark.sql.functions.col("text")))
      .drop("text")
    val n = v2.withColumn("fp",
      TextAnalysis.fingerprint(org.apache.spark.sql.functions.col("text")))
      .drop("text")
    val got = CorpusPrep.corpusDiff(o, n, fpCol = Some("fp")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got(2L) == "changed" && got(3L) == "removed" && got(5L) == "added")
  }
}
