package graft.llm

import graft.SparkSpec

class GramLmSpec extends SparkSpec {
  import spark.implicits._

  // "ababab" and "ababab": shared trigrams aba/bab dominate the model;
  // "zq" is too short for a trigram; "xyzzy!" is all-rare
  private val docs = Seq(
    (1L, "ababab"),
    (2L, "ababab"),
    (3L, "zq"),
    (4L, "xyzzy!")).toDF("doc_id", "text")

  test("gramFamiliarity scores common grams high and rare grams low") {
    val got = TextAnalysis.gramFamiliarity(docs, minCf = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), Option(r.getAs[Any]("mean_gram_cf")),
          Option(r.getAs[Any]("rare_frac")))))
      .toMap
    // docs 1+2: grams aba,bab,aba,bab → model cf(aba)=4, cf(bab)=4
    assert(got(1L)._1 == 4L)
    assert(got(1L)._2.contains(4.0))
    assert(got(1L)._3.contains(0.0)) // cf=4 >= minCf=3 → nothing rare
    assert(got(2L) == got(1L))
    // doc 3: shorter than n → no grams, NULL ratios
    assert(got(3L) == ((0L, None, None)))
    // doc 4: xyzzy! → 4 grams each cf=1 < minCf → all rare, mean cf 1.0
    assert(got(4L)._1 == 4L)
    assert(got(4L)._2.contains(1.0))
    assert(got(4L)._3.contains(1.0))
  }

  test("gramFamiliarity normalizes case and whitespace runs") {
    val d = Seq((1L, "AB  cd"), (2L, "ab cd")).toDF("doc_id", "text")
    val got = TextAnalysis.gramFamiliarity(d, minCf = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Double]("mean_gram_cf"))))
      .toMap
    // both normalize to "ab cd" → identical gram multisets, every gram cf=2
    assert(got(1L) == ((3L, 2.0)))
    assert(got(2L) == ((3L, 2.0)))
  }

  test("blocklistFilter counts whole-token occurrences case-insensitively") {
    val d = Seq(
      (1L, "Slow code is SLOW and slowly broken"),  // 2 whole-token hits
      (2L, "fast clean code"),
      (3L, "slow slow slow slow")).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistFilter(d, Seq("slow", "broken"), maxHits = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_blocked"), r.getAs[Boolean]("blocked")))).toMap
    // doc 1: "Slow"+"SLOW"+"broken" = 3 (NOT "slowly" — whole tokens only)
    assert(got(1L) == ((3L, true)))
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((4L, true)))
  }

  test("sourcePriors blocks sources below the keep-rate threshold") {
    // src_good: long wordy docs with stopwords → keep; src_bad: junk
    val good = (1 to 4).map(i => (i.toLong,
      "the quick brown fox jumps over the lazy dog again and again " * 2,
      "src_good"))
    val bad = (5 to 8).map(i => (i.toLong, "!!!!", "src_bad"))
    val df = (good ++ bad).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourcePriors(df).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_keep"),
          r.getAs[Double]("keep_frac"), r.getAs[Boolean]("blocked"))))
      .toMap
    assert(got("src_good") == ((4L, 4L, 1.0, false)))
    assert(got("src_bad") == ((4L, 0L, 0.0, true)))
  }
}
