package graft.llm

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "apple cherry"),
    (3L, "banana banana banana cherry")).toDF("doc_id", "text")

  test("vocabulary reports collection and document frequency per token") {
    val got = Vocab.collectVocab(docs)
    assert(got == Map(
      "apple" -> (3L, 2L), "banana" -> (4L, 2L), "cherry" -> (2L, 2L)))
  }

  test("keywords rank by tf/df with token tie-break") {
    val got = TextAnalysis.keywords(docs, k = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")) ->
        ((r.getAs[String]("token"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Double]("score"))))
      .toMap
    // doc 1: apple tf=2 df=2 → 1.0; banana tf=1 df=2 → 0.5
    assert(got((1L, 1L)) == (("apple", 2L, 2L, 1.0)))
    assert(got((1L, 2L)) == (("banana", 1L, 2L, 0.5)))
    // doc 2: apple and cherry both 1/2 → tie broken by token asc
    assert(got((2L, 1L))._1 == "apple")
    assert(got((2L, 2L))._1 == "cherry")
    // doc 3: banana 3/2 beats cherry 1/2
    assert(got((3L, 1L)) == (("banana", 3L, 2L, 1.5)))
    assert(got((3L, 2L))._1 == "cherry")
  }

  test("bpePairCounts weights adjacent char pairs by collection frequency") {
    // vocab: apple cf=3, banana cf=4, cherry cf=2
    val got = TextAnalysis.bpePairCounts(docs).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) ->
        r.getAs[Long]("pair_count")).toMap
    // "an" appears twice inside banana → 2 * cf(banana) = 8
    assert(got(("a", "n")) == 8L)
    // "pp" once in apple → cf(apple) = 3
    assert(got(("p", "p")) == 3L)
    // "ch" once in cherry → cf(cherry) = 2
    assert(got(("c", "h")) == 2L)
    // single-char tokens contribute nothing; all pairs positive
    assert(got.values.forall(_ > 0))
  }

  test("keywords emits at most k rows per doc, rk dense from 1") {
    val rows = TextAnalysis.keywords(docs, k = 1).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("rk") == 1L))
  }
}

private object Vocab {
  def collectVocab(docs: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    TextAnalysis.vocabulary(docs).collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("cf"), r.getAs[Long]("df")))).toMap
}
