package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Attribute the bounded-sessions replay's per-trigger fixed cost
  * (round-17 ask #4): the sf10 100k-slice replay holds a ~69 s floor set
  * by ~0.4 s/trigger of driver-side cost that round 16 showed is NOT the
  * state store (statePartitions and RocksDB both ruled out). Structured
  * Streaming's progress events carry the split directly — `durationMs`
  * breaks every trigger into latestOffset / getBatch / queryPlanning /
  * addBatch (the actual work) / walCommit / commitOffsets — so this main
  * replays the registered composition with a listener and aggregates the
  * split across all triggers, plus the state operators' commit metrics.
  *
  * `runMain graft.tools.SessionsTrigger [rowsPerSlice]` (default 100000);
  * env SPARK_GRAFT_SF_DIR picks the fixture. One JSON line →
  * bench/sessions_trigger_sf10_r17.json.
  */
object SessionsTrigger {
  def main(args: Array[String]): Unit = {
    val rowsPerSlice = args.headOption.map(_.toLong).getOrElse(100000L)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = graft.core.TempDirs.scratch("sess_trig_src")
    val out = graft.core.TempDirs.scratch("sess_trig_out")
    val ckpt = graft.core.TempDirs.scratch("sess_trig_ckpt")
    val nSlices = graft.streaming.StreamReplay.stageTimeSliced(
      spark.read.parquet(s"$sfDir/events.parquet"), src,
      rowsPerSlice = rowsPerSlice)
    println(s"[trig] staged $nSlices slices of ~$rowsPerSlice rows")

    // stage-level walls inside addBatch: the micro-batch runs a 2-stage
    // job (slice scan + shuffle write, then the 8-partition state stage)
    // plus the sink's commit — stage submission→completion walls split
    // addBatch into named terms
    val stageWall = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = s.stageInfo
          val wall = (for {
            t0 <- info.submissionTime; t1 <- info.completionTime
          } yield t1 - t0).getOrElse(0L)
          // with default openCost a 100k-row slice file is ONE map task,
          // so task count discriminates: 1t = slice scan + shuffle write,
          // 8t = the statePartitions stage (state update + sink write)
          val kind = s"stage_${info.numTasks}t"
          stageWall.merge(kind, (wall, 1L),
            (a, b) => (a._1 + b._1, a._2 + b._2)): Unit
        }
      })

    // collected per-batch: durationMs splits + state commit metrics
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Map[String, Long], Map[String, Long])]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.map { case (k, v) => k -> v.longValue }.toMap
        val state = p.stateOperators.headOption.map { so =>
          Map("commitTimeMs" -> so.commitTimeMs,
            "allUpdatesTimeMs" -> so.allUpdatesTimeMs,
            "allRemovalsTimeMs" -> so.allRemovalsTimeMs,
            "numRowsTotal" -> so.numRowsTotal)
        }.getOrElse(Map.empty[String, Long])
        batches.add((p.batchId, dur, state))
      }
    })

    val t0 = System.nanoTime()
    // same ts normalization as SparkEntry.eventsStream: watermarks reject
    // TIMESTAMP_NTZ and the raw fixture carries TIMESTAMP(NANOS)-as-long
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val fixed = rawSchema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val wall = try {
      val q = graft.streaming.StreamingEvents.sessionWindowStream(fixed)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    // listener events are posted async; drain before aggregating
    Thread.sleep(2000)

    import scala.jdk.CollectionConverters._
    val all = batches.asScala.toSeq.sortBy(_._1)
    def agg(key: String, maps: Seq[Map[String, Long]]): (Long, Double) = {
      val xs = maps.map(_.getOrElse(key, 0L))
      (xs.sum, if (xs.isEmpty) 0.0 else xs.sum.toDouble / xs.size)
    }
    val durKeys = all.flatMap(_._2.keys).distinct.sorted
    val stateKeys = all.flatMap(_._3.keys).distinct.sorted
    val durJson = durKeys.map { k =>
      val (s, m) = agg(k, all.map(_._2))
      f""""$k":{"total_ms":$s,"mean_ms":$m%.1f}"""
    }.mkString(",")
    val stateJson = stateKeys.filterNot(_ == "numRowsTotal").map { k =>
      val (s, m) = agg(k, all.map(_._3))
      f""""$k":{"total_ms":$s,"mean_ms":$m%.1f}"""
    }.mkString(",")
    val stageJson = stageWall.asScala.toSeq.sortBy(_._1).map {
      case (k, (tot, n)) =>
        f""""$k":{"total_ms":$tot,"count":$n,"mean_ms":${tot.toDouble / math.max(1, n)}%.1f}"""
    }.mkString(",")
    println(
      f"""{"what":"per-trigger durationMs split of the bounded-sessions replay (round-17 ask #4)","sfDir":"$sfDir","rowsPerSlice":$rowsPerSlice,"slices":$nSlices,"batches":${all.size},"wall_s":$wall%.1f,"durationMs":{$durJson},"stateOperator":{$stateJson},"stageWalls":{$stageJson}}""")
    spark.stop()
  }
}
