package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("matches brute force incl. boundaries and bucket-spanning intervals") {
    // bucket width 100; interval [95, 155] spans a bucket boundary
    val points = Seq((1L, 10L, ts(95)), (2L, 10L, ts(100)), (3L, 10L, ts(155)),
      (4L, 10L, ts(156)), (5L, 10L, ts(94)), (6L, 99L, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val ivals = Seq((10L, ts(95), ts(155), 7L), (10L, ts(300), ts(320), 8L))
      .toDF("user_id", "s", "e", "ival_id")
    val got = RangeJoin.pointInInterval(points, ivals, Seq("user_id"),
        "ts", "s", "e", bucketSeconds = 100, rightCols = Seq("ival_id"))
      .select("event_id", "ival_id").as[(Long, Long)].collect().toSet
    // inclusive both ends; 4 (after end), 5 (before start), 6 (other key) drop
    assert(got == Set((1L, 7L), (2L, 7L), (3L, 7L)))
  }

  test("a pair meets exactly once even when the interval spans two buckets") {
    val points = Seq((1L, ts(150))).toDF("event_id", "ts")
    val ivals = Seq((ts(95), ts(155), 7L)).toDF("s", "e", "ival_id")
    val got = RangeJoin.pointInInterval(points, ivals, Seq(),
      "ts", "s", "e", bucketSeconds = 100, rightCols = Seq("ival_id"))
    assert(got.count() == 1) // no dedup pass, no duplicate row
  }

  test("plan shape: an equi-join on (keys, bucket) — never a nested loop") {
    val points = (0 until 500).map(i => (i.toLong, i.toLong % 7, ts(i * 13)))
      .toDF("event_id", "user_id", "ts")
    val ivals = (0 until 100).map(i => (i.toLong % 7, ts(i * 60), ts(i * 60 + 90), i.toLong))
      .toDF("user_id", "s", "e", "ival_id")
    val out = RangeJoin.pointInInterval(points, ivals, Seq("user_id"),
      "ts", "s", "e", bucketSeconds = 100, rightCols = Seq("ival_id"))
    out.collect() // finalize AQE
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must stay an equi-join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
      s"expected a hash/sort-merge equi-join:\n$plan")
  }

  test("validated contract: oversized and inverted intervals fail loudly") {
    val points = Seq((1L, ts(50))).toDF("event_id", "ts")
    val long = Seq((ts(0), ts(500), 1L)).toDF("s", "e", "ival_id")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, long, Seq(), "ts", "s", "e",
        bucketSeconds = 100, rightCols = Seq("ival_id"))
    }
    assert(e1.getMessage.contains("exceeds the bucket width"))
    val inverted = Seq((ts(100), ts(50), 1L)).toDF("s", "e", "ival_id")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, inverted, Seq(), "ts", "s", "e",
        bucketSeconds = 100, rightCols = Seq("ival_id"))
    }
    assert(e2.getMessage.contains("end precedes start"))
  }
}
