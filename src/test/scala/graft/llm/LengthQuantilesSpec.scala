package graft.llm

import graft.SparkSpec

class LengthQuantilesSpec extends SparkSpec {
  import spark.implicits._

  // source a: token counts 1..10 (doc_id fixes the order); source b: all 7
  private lazy val docs =
    ((1 to 10).map(i => (i.toLong, "a", Seq.fill(i)("w").mkString(" "))) ++
      (11 to 13).map(i => (i.toLong, "b", "w w w w w w w")))
      .toDF("doc_id", "source", "text")

  test("quantile q is the value at row ceil(q*n) in sorted order") {
    val out = TextAnalysis.lengthQuantiles(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("p10"),
          r.getAs[Long]("p50"), r.getAs[Long]("p90")))).toMap
    // n=10: ceil(1)=1 → 1; ceil(5)=5 → 5; ceil(9)=9 → 9
    assert(out("a") == ((10L, 1L, 5L, 9L)))
    // constant source: every quantile is the constant
    assert(out("b") == ((3L, 7L, 7L, 7L)))
  }

  test("custom quantile list and p100 names") {
    val out = TextAnalysis.lengthQuantiles(docs, quantiles = Seq(0.25, 1.0))
      .where($"source" === "a").collect().head
    assert(out.getAs[Long]("p25") == 3L) // ceil(2.5) = 3rd smallest
    assert(out.getAs[Long]("p100") == 10L)
  }
}
