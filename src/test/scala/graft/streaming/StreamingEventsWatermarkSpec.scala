package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Append-mode watermark semantics for the windowed event aggregation: a
  * window only emits once the watermark passes its end, and events arriving
  * later than the watermark horizon are dropped deterministically — the
  * state-expiry contract that bounds memory on an unbounded stream (the
  * complete-mode test in StorageSpec cannot see either behavior).
  */
class StreamingEventsWatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("append mode emits only watermark-closed windows and drops too-late events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamingEvents.hourlyAggStream(events, watermark = "2 hours")
      .writeStream.format("memory").queryName("hourly_wm")
      .outputMode("append").start()

    // batch 1: events in hours 0 and 1; max ts 01:30 → watermark 23:30 prev
    // day after the batch — nothing closes yet
    input.addData((ts(0, 10), "click", 1.0), (ts(0, 40), "click", 2.0),
      (ts(1, 30), "view", 3.0))
    q.processAllAvailable()
    assert(spark.table("hourly_wm").isEmpty)

    // batch 2: an hour-6 event advances the watermark to 04:00 → hours 0-1
    // close and emit; nothing else does
    input.addData((ts(6, 0), "view", 10.0))
    q.processAllAvailable()
    val closed = spark.table("hourly_wm")
      .select("hour", "event_type", "n_events", "sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(closed == Set(
      (ts(0, 0), "click", 2L, 3.0),
      (ts(1, 0), "view", 1L, 3.0)))

    // batch 3: an hour-0 straggler is BEHIND the 04:00 watermark → dropped;
    // a fresh hour-12 event closes hour 6, whose count must NOT include the
    // straggler's window
    input.addData((ts(0, 50), "click", 99.0), (ts(12, 0), "click", 1.0))
    q.processAllAvailable()
    val after = spark.table("hourly_wm")
      .select("hour", "event_type", "n_events", "sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    q.stop()
    assert(after == closed + ((ts(6, 0), "view", 1L, 10.0)))
  }
}
