package graft.llm

import graft.SparkSpec

class LineFilterSpec extends SparkSpec {
  import spark.implicits._

  private val footer = "subscribe to our newsletter today"
  private val twice = "this line repeats in just two docs"

  private lazy val docs = Seq(
    (1L, s"alpha unique content one\n$footer\nmore alpha text"),
    (2L, s"$footer\nbeta body line"),
    (3L, s"gamma text here\n$footer"),
    (4L, s"delta only original material\n$twice"),
    (5L, s"$twice\nepsilon tail"),
    // within-doc repeats count once: doc 6 repeats its own line twice but
    // only docs 6+7 carry it — under the maxDocs=3 threshold
    (6L, "zeta repeated internally\nzeta repeated internally"),
    (7L, "zeta repeated internally\nown eta line"),
    (8L, footer), // all-boilerplate doc survives empty
    (9L, "ok\nok\nok\nshort lines never ban"), // "ok" is under minChars
  ).toDF("doc_id", "text")

  private lazy val out = Dedup.filterRepeatedLines(docs, maxDocs = 3)
    .collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("clean_text"), r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_kept")))).toMap

  test("a line in >= maxDocs distinct docs drops from every doc") {
    assert(out(1L)._1 == "alpha unique content one\nmore alpha text")
    assert(out(2L)._1 == "beta body line")
    assert(out(3L)._1 == "gamma text here")
  }

  test("a line under the distinct-doc threshold survives everywhere") {
    assert(out(4L)._1 == s"delta only original material\n$twice")
    assert(out(5L)._1 == s"$twice\nepsilon tail")
  }

  test("within-doc repeats count as one document") {
    assert(out(6L)._1 == "zeta repeated internally\nzeta repeated internally")
    assert(out(7L)._1 == "zeta repeated internally\nown eta line")
  }

  test("all-boilerplate doc survives with empty text and exact counts") {
    assert(out(8L) == (("", 1L, 0L)))
    assert(out(1L)._2 == 3L && out(1L)._3 == 2L)
  }

  test("lines shorter than minChars never ban, even at high frequency") {
    assert(out(9L)._1 == "ok\nok\nok\nshort lines never ban")
  }
}
