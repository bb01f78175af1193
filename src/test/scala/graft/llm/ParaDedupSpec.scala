package graft.llm

import graft.SparkSpec

class ParaDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    Dedup.dedupParagraphs(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_paras"),
          r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped")))).toMap

  test("cross-doc repeated paragraph survives only in the lowest doc") {
    val got = run(Seq(
      (1L, "unique one\nshared footer\nunique two"),
      (2L, "other text\nshared footer"),
      (3L, "shared footer\nmore text")))
    assert(got(1L) == (("unique one\nshared footer\nunique two", 3L, 3L, 0L)))
    assert(got(2L) == (("other text", 2L, 1L, 1L)))
    assert(got(3L) == (("more text", 2L, 1L, 1L)))
  }

  test("within-doc repeat keeps the first ordinal only") {
    val got = run(Seq((5L, "a b\nc d\na b")))
    assert(got(5L) == (("a b\nc d", 3L, 2L, 1L)))
  }

  test("blank paragraphs are dropped unconditionally, order preserved") {
    val got = run(Seq((1L, "first\n\n  \nsecond")))
    assert(got(1L) == (("first\nsecond", 2L, 2L, 0L)))
  }

  test("a doc that is all repeats survives with empty clean text") {
    val got = run(Seq((1L, "only para"), (2L, "only para")))
    assert(got(1L) == (("only para", 1L, 1L, 0L)))
    assert(got(2L) == (("", 1L, 0L, 1L)))
  }

  test("empty and whitespace docs are row-preserved with zero paragraphs") {
    val got = run(Seq((1L, ""), (2L, "   ")))
    assert(got(1L) == (("", 0L, 0L, 0L)))
    assert(got(2L) == (("", 0L, 0L, 0L)))
  }
}
