package graft.llm

import graft.SparkSpec

class MixtureSampleSpec extends SparkSpec {
  import spark.implicits._

  // 3 sources × 50 docs × 4 tokens = 200 tokens per source
  private lazy val docs = (0 until 150).map { i =>
    (i.toLong, s"src${i % 3}", "one two three four")
  }.toDF("doc_id", "source", "text")

  test("oversubscribed source clamps to keep-everything") {
    // share·budget = 400 > 200 source tokens → rate 1.0
    val out = Sampling.mixtureSample(docs,
      shares = Map("src0" -> 1.0), tokenBudget = 400L)
    assert(out.where($"source" === "src0").count() == 50)
  }

  test("sources outside the recipe drop entirely") {
    val out = Sampling.mixtureSample(docs,
      shares = Map("src0" -> 1.0), tokenBudget = 400L)
    assert(out.where($"source" =!= "src0").count() == 0)
  }

  test("keep rate tracks share·budget / source tokens") {
    // share·budget = 100 of 200 source tokens → rate 0.5 → threshold 5000;
    // the kept set is exactly the docs whose mix-bucket is below it
    val out = Sampling.mixtureSample(docs,
      shares = Map("src1" -> 1.0), tokenBudget = 100L)
    val kept = out.collect().map(_.getAs[Long]("doc_id")).toSet
    val expected = docs.where($"source" === "src1")
      .where(Sampling.bucket($"doc_id", "mix") < 5000)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < 50)
  }

  test("a zero-token source drops entirely (no NaN/Inf rate keep-all)") {
    // share·budget / 0 src_tokens would be Inf — and least() treats NaN as
    // larger than any double — so without the guard every doc of the
    // zero-token source would be kept
    val withEmpty = docs.unionByName(
      Seq((900L, "empty", ""), (901L, "empty", "")).toDF("doc_id", "source", "text"))
    val out = Sampling.mixtureSample(withEmpty,
      shares = Map("src0" -> 0.5, "empty" -> 0.5), tokenBudget = 100L)
    assert(out.where($"source" === "empty").count() == 0)
    assert(out.where($"source" === "src0").count() > 0)
  }

  test("manifest carries exact per-doc token counts and is deterministic") {
    val shares = Map("src0" -> 0.5, "src1" -> 0.25)
    val a = Sampling.mixtureSample(docs, shares, 200L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"))).sorted
    val b = Sampling.mixtureSample(docs, shares, 200L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"))).sorted
    assert(a.sameElements(b))
    assert(a.forall(_._2 == 4L))
  }
}
