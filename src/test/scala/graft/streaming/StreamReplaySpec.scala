package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The bounded-state sessionization contract: a time-sliced
  * one-file-per-trigger replay produces EXACTLY the rows of the one-batch
  * replay (no event is ever late under time-ordered slices, so the flush
  * rule emits the same session set) while the session state PEAK stays at
  * |slice| + |watermark horizon| instead of every session in history.
  */
class StreamReplaySpec extends SparkSpec {
  import spark.implicits._

  // 400 users x 1 session each, sessions spread uniformly over ~40 days:
  // the 2h watermark horizon holds only a handful of sessions at a time
  private lazy val events = {
    val rows = for {
      u <- 0 until 400
      e <- 0 until 3
    } yield (u.toLong * 3 + e, u.toLong,
      java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(u.toLong * 9000 + e * 60)), // users 2.5h apart, events 1min
      "click", (u + e).toDouble)
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("stageTimeSliced: slices are time-ordered and complete") {
    val dir = graft.core.TempDirs.scratch("replay_slices")
    val n = StreamReplay.stageTimeSliced(events, dir, rowsPerSlice = 60)
    assert(n == 20, s"1200 rows / 60 per slice, got $n")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("slice_")).sorted
    assert(files.nonEmpty && files.length <= n)
    // completeness: the union of slices is the input, exactly
    assert(spark.read.parquet(dir).count() == 1200L)
    // time order: each file's max ts < the next file's min ts
    val ranges = files.map { f =>
      val r = spark.read.parquet(s"$dir/$f")
        .agg(min(col("ts")), max(col("ts"))).collect().head
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, "slices must not interleave in time")
      case _ => ()
    }
  }

  test("bounded replay: identical session rows, state peak stays at the " +
      "horizon instead of the full history") {
    def run(srcDir: String, opts: Map[String, String]): (Set[Seq[Any]], Long) = {
      val out = graft.core.TempDirs.scratch("replay_out")
      val ckpt = graft.core.TempDirs.scratch("replay_ckpt")
      val listener = StateMetrics.attach(spark)
      val stream = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .options(opts).parquet(srcDir)
      val q = StreamingEvents.sessionWindowStream(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // progress events are async: wait for the state metrics to land
      val deadline = System.nanoTime() + 10000000000L
      var peak = listener.drain()
      while (peak._1 == 0 && System.nanoTime() < deadline) {
        Thread.sleep(100); peak = listener.drain()
      }
      spark.streams.removeListener(listener)
      val rows = spark.read.parquet(out).collect().map(_.toSeq).toSet
      (rows, peak._1)
    }
    // one-batch replay: every session is simultaneously live
    val oneDir = graft.core.TempDirs.scratch("replay_one_src")
    events.coalesce(1).write.parquet(oneDir)
    val (oneRows, onePeak) = run(oneDir, Map.empty)
    // time-sliced replay: watermark advances per batch, sessions evict
    val sliceDir = graft.core.TempDirs.scratch("replay_sliced_src")
    StreamReplay.stageTimeSliced(events, sliceDir, rowsPerSlice = 60): Unit
    val (slicedRows, slicedPeak) = run(sliceDir, Map("maxFilesPerTrigger" -> "1"))

    assert(oneRows == slicedRows, "bounded replay must emit identical sessions")
    assert(oneRows.nonEmpty, "flush predicate must emit most sessions")
    // ~400 sessions live at once in the one-batch replay; the sliced replay
    // holds one slice (~20 sessions) + the 2.5h horizon (~2 sessions)
    assert(onePeak >= 300L, s"one-batch replay should hold ~all sessions, got $onePeak")
    assert(slicedPeak * 4 <= onePeak,
      s"sliced replay state must stay bounded: $slicedPeak vs $onePeak")
  }
}
