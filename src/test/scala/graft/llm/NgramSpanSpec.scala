package graft.llm

import graft.SparkSpec

/** [[Dedup.duplicateNgramSpans]]: cross-doc duplicated runs surface as
  * maximal merged token spans; within-doc-only repeats and short overlaps
  * stay silent.
  */
class NgramSpanSpec extends SparkSpec {
  import spark.implicits._

  private val n = 4

  private def spans(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] =
    Dedup.duplicateNgramSpans(docs.toDF("doc_id", "text"), n = n)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("a shared run of exactly n tokens spans both docs at its position") {
    val shared = "alpha beta gamma delta"
    val got = spans(Seq(
      1L -> s"$shared tail1 tail2 tail3 tail4",
      2L -> s"head1 head2 $shared mid1 mid2"))
    assert(got === Set((1L, 0L, 3L, 4L), (2L, 2L, 5L, 4L)))
  }

  test("a longer shared run merges its overlapping grams into ONE maximal span") {
    val run = "w1 w2 w3 w4 w5 w6 w7" // 7 tokens: 4 dup grams chain into one span
    val got = spans(Seq(
      1L -> s"$run x1 x2 x3 x4",
      2L -> s"y1 y2 y3 $run"))
    assert(got === Set((1L, 0L, 6L, 7L), (2L, 3L, 9L, 7L)))
  }

  test("two separated shared runs in one doc stay two islands") {
    val a = "a1 a2 a3 a4"
    val b = "b1 b2 b3 b4"
    // gap of n+1 unique tokens between the runs > n → no merge
    val got = spans(Seq(
      1L -> s"$a g1 g2 g3 g4 g5 $b",
      2L -> a,
      3L -> b))
    assert(got.filter(_._1 == 1L) === Set((1L, 0L, 3L, 4L), (1L, 9L, 12L, 4L)))
  }

  test("a repeat INSIDE one doc only is not cross-doc duplication") {
    val run = "r1 r2 r3 r4"
    val got = spans(Seq(
      1L -> s"$run z1 z2 z3 z4 z5 $run",
      2L -> "other words entirely here now"))
    assert(got.isEmpty)
  }

  test("docs shorter than n tokens produce no grams and no spans") {
    val got = spans(Seq(1L -> "one two three", 2L -> "one two three"))
    assert(got.isEmpty)
  }

  test("case-insensitive: duplication is detected on lowercased tokens") {
    val got = spans(Seq(
      1L -> "Alpha Beta Gamma Delta",
      2L -> "alpha beta gamma delta"))
    assert(got === Set((1L, 0L, 3L, 4L), (2L, 0L, 3L, 4L)))
  }
}
