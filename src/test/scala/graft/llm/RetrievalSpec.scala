package graft.llm

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark runs fast very fast"),
    (2L, "spark is a query engine"),
    (3L, "the cat sat on the mat"),
    (4L, "fast fast fast fast fast fast fast fast"),
    (5L, "FAST spark"), // case-folds
  ).toDF("doc_id", "text")

  test("docs sharing no query term never surface") {
    val out = Retrieval.bm25TopK(docs, Seq(0L -> "spark fast"), k = 10)
    assert(!out.collect().map(_.getAs[Long]("doc_id")).contains(3L))
  }

  test("a doc matching both terms outranks equal-length single-term docs") {
    val out = Retrieval.bm25TopK(docs, Seq(0L -> "spark engine"), k = 10)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id"))
    // doc 2 has both terms; docs 1 and 5 have only "spark"
    assert(out.head == 2L)
  }

  test("tf saturates: 8× repetition does not scale the score 8×") {
    val out = Retrieval.bm25TopK(docs, Seq(0L -> "fast"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    // doc 4 (tf=8, dl=8) vs doc 5 (tf=1, dl=2): more weight, but bounded
    assert(out(4L) > out(5L))
    assert(out(4L) < out(5L) * 8.0)
  }

  test("matching is case-insensitive on both sides") {
    val out = Retrieval.bm25TopK(docs, Seq(0L -> "SPARK"), k = 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(1L, 2L, 5L))
  }

  test("per-query top-k with dense ranks, ties broken by doc id") {
    val out = Retrieval.bm25TopK(docs,
      Seq(0L -> "spark", 1L -> "fast"), k = 2).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.sameElements(Array(1L, 2L)))
    }
  }

  test("only broadcast exchanges: the corpus side never shuffles text") {
    val plan = Retrieval.bm25TopK(docs, Seq(0L -> "spark fast"), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"stats must ride a broadcast, not a cartesian:\n$plan")
  }
}
