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

  test("rebalance spreads a hollow-split file scan: few files, many " +
       "scheduled byte-range splits") {
    // one ~2 MB single-row-group parquet file; openCostInBytes shrunk so
    // Spark schedules >= target byte-range splits over it — only the split
    // containing the row group's start would carry rows (the sf10
    // documents pathology, bench/bm25_phases_sf10_r16.json)
    val dir = TempDirs.scratch("rebalance_hollow")
    spark.range(20000).selectExpr("id", "repeat('x', 100) AS text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val prev = spark.conf.getOption("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", "16384")
    try {
      val scan = spark.read.parquet(dir)
      val target = spark.sparkContext.defaultParallelism
      assert(scan.inputFiles.length < target)
      assert(scan.rdd.getNumPartitions >= target,
        "fixture must schedule >= target splits for the guard branch")
      val out = Scratch.rebalance(scan)
      assert(!(out eq scan))
      assert(out.rdd.getNumPartitions == target)
      // beyond the force-bytes gate the scan is kept as planned
      spark.conf.set("graft.rebalance.forceBytes", "1")
      assert(Scratch.rebalance(scan) eq scan)
    } finally {
      spark.conf.unset("graft.rebalance.forceBytes")
      prev.fold(spark.conf.unset("spark.sql.files.openCostInBytes"))(
        v => spark.conf.set("spark.sql.files.openCostInBytes", v))
    }
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
