package graft.core

import graft.SparkSpec

/** The rebalance contract: repartition up ONLY when the source plans fewer
  * partitions than the session's parallelism — at real scale (many input
  * splits) it must be the identity, adding no exchange to a big scan.
  */
class ScratchSpec extends SparkSpec {
  import spark.implicits._

  test("rebalance is the identity when the scan already plans enough " +
       "partitions") {
    val wide = spark.range(1000).repartition(16).toDF("x")
    assert(Scratch.rebalance(wide) eq wide) // same object, no new plan node
  }

  test("stageIfLarge skips the write for a small source and stages a " +
       "large one") {
    val src = spark.range(100).toDF("x")
    val derived = src.selectExpr("x * 2 AS y")
    // default 64 MB gate: a 100-row source stays un-staged (same object)
    assert(Scratch.stageIfLarge(derived, "t", src) eq derived)
    // force the gate to 0: the frame comes back re-opened from parquet
    spark.conf.set("graft.scratch.stageMinBytes", "0")
    try {
      val staged = Scratch.stageIfLarge(derived, "t", src)
      assert(!(staged eq derived))
      assert(staged.as[Long].collect().sorted.sameElements(
        (0L until 100L).map(_ * 2)))
    } finally spark.conf.unset("graft.scratch.stageMinBytes")
  }

  test("rebalance repartitions a compact single-partition source up to " +
       "the session parallelism") {
    val narrow = spark.range(1000).coalesce(1).toDF("x")
    val out = Scratch.rebalance(narrow)
    assert(!(out eq narrow))
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // same rows, only redistributed
    assert(out.as[Long].collect().sorted.sameElements(0L until 1000L))
  }
}
