package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def left = Seq(
    (1L, 10L, ts(100)), // after r@50  -> matches 50
    (2L, 10L, ts(200)), // equal ts    -> inclusive match 200
    (3L, 10L, ts(40)),  // before any  -> no match
    (4L, 20L, ts(500)), // key with no right rows -> no match
  ).toDF("event_id", "user_id", "ts")

  private def right = Seq(
    (10L, ts(50), 1.0),
    (10L, ts(200), 2.0),
    (10L, ts(300), 3.0),
  ).toDF("user_id", "ts", "value")

  test("backward as-of: greatest right ts <= left ts, equal ts inclusive, " +
       "null when nothing precedes") {
    val out = AsofJoin.asofJoin(left, right, on = Seq("user_id"))
      .select("event_id", "asof_ts", "asof_value")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some(ts(50)), Some(1.0)))
    assert(out(2L) == (Some(ts(200)), Some(2.0))) // l.ts >= r.ts: inclusive
    assert(out(3L) == (None, None))
    assert(out(4L) == (None, None))
  }

  test("forward as-of: smallest right ts >= left ts, equal ts inclusive") {
    val out = AsofJoin.asofJoin(left, right, on = Seq("user_id"),
        forward = true)
      .select("event_id", "asof_ts", "asof_value")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some(ts(200)), Some(2.0))) // next after 100
    assert(out(2L) == (Some(ts(200)), Some(2.0))) // equal ts inclusive
    assert(out(3L) == (Some(ts(50)), Some(1.0)))  // next after 40
    assert(out(4L) == (None, None))               // key with no right rows
    // forward tolerance: gap measured the other way
    val tol = AsofJoin.asofJoin(left, right, on = Seq("user_id"),
        forward = true, toleranceSeconds = Some(20L))
      .select("event_id", "asof_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tol(3L) == Some(1.0)) // 50 - 40 = 10s <= 20s
    assert(tol(1L).isEmpty)      // 200 - 100 = 100s > 20s
  }

  test("tolerance nulls stale matches") {
    val out = AsofJoin.asofJoin(left, right, on = Seq("user_id"),
        toleranceSeconds = Some(10L))
      .select("event_id", "asof_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isEmpty)        // 100 - 50 = 50s > 10s: too stale
    assert(out(2L) == Some(2.0))   // 0s gap survives
  }

  test("plan shape: no join operator at all — one keyed exchange + window") {
    val out = AsofJoin.asofJoin(left, right, on = Seq("user_id"))
    out.collect() // finalize AQE
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"as-of must never plan a loop join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"the union+carry shape has no join node:\n$plan")
    // AQE prints final + initial plans; count shuffles in the final only
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(finalPlan).length
    assert(exchanges == 1, s"expected exactly one keyed shuffle, got " +
      s"$exchanges:\n$finalPlan")
  }

  test("dedupRight canonicalizes duplicate (key, ts) rows by tiebreak") {
    val dup = Seq((10L, ts(50), 1.0, 7L), (10L, ts(50), 9.0, 8L),
      (10L, ts(60), 5.0, 9L)).toDF("user_id", "ts", "value", "seq")
    val got = AsofJoin.dedupRight(dup, Seq("user_id"), "ts", "seq")
      .orderBy("ts").select("value").as[Double].collect().toSeq
    assert(got == Seq(9.0, 5.0)) // seq=8 wins the ts=50 tie
  }

  test("matches the brute-force per-row maximum on a random-ish grid") {
    val l = (0 until 50).map(i => (i.toLong, (i % 5).toLong, ts(i * 7)))
      .toDF("event_id", "user_id", "ts")
    val r = (0 until 30).map(i => ((i % 5).toLong, ts(i * 11), i.toDouble))
      .toDF("user_id", "ts", "value")
    val got = AsofJoin.asofJoin(l, r, on = Seq("user_id"))
      .select("event_id", "asof_value")
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    val rRows = (0 until 30).map(i => ((i % 5).toLong, i * 11L, i.toDouble))
    (0 until 50).foreach { i =>
      val (key, lts) = ((i % 5).toLong, i * 7L)
      val want = rRows.filter(x => x._1 == key && x._2 <= lts)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(i.toLong) == want, s"event $i")
    }
  }
}
