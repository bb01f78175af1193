package graft.tools

import java.lang.management.ManagementFactory

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Attribute q_ann_recall's sf10 driver-heap peak (round-17 ask #3): the
  * r16 scale record shows 8.26 GB "driver peak", unattributed — local
  * mode runs executors in the driver JVM, so the number conflates real
  * driver-side structures (collected results, broadcasts, index params)
  * with executor-side EXECUTION memory (window sort buffers, hash
  * aggregates). This main runs the registered query with
  *   (a) a 100 ms heap poller (used bytes, max-so-far),
  *   (b) a task listener summing per-stage peakExecutionMemory — the
  *       Tungsten-accounted execution memory, i.e. the executor share,
  *   (c) one `jcmd GC.class_histogram` (top 25 classes) captured the
  *       first time the heap crosses 75% of its final observed peak —
  *       naming WHAT holds the bytes at peak.
  * If the top stages' peakExecutionMemory ≈ the heap peak, the 8.26 GB is
  * executor conflation and a real cluster's driver never sees it; a
  * histogram dominated by driver-side classes says otherwise.
  *
  * `runMain graft.tools.AnnRecallHeap [queryName]` (default q_ann_recall);
  * env SPARK_GRAFT_SF_DIR. One JSON line → bench/ann_recall_heap_r17.json.
  */
object AnnRecallHeap {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_ann_recall")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // (b) per-stage execution-memory accounting
    val stagePeak = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageNames.put(s.stageInfo.stageId, s.stageInfo.name.take(80)): Unit
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          stagePeak.merge(t.stageId,
            (m.peakExecutionMemory, Option(stageNames.get(t.stageId)).getOrElse("?")),
            (a, b) => (a._1 + b._1, a._2)): Unit
        }
    })

    // (a) heap poller + (c) one histogram near peak
    val mem = ManagementFactory.getMemoryMXBean
    @volatile var peak = 0L
    @volatile var running = true
    @volatile var histogram: Seq[String] = Nil
    val pid = ProcessHandle.current().pid()
    // first pass learns the peak; second pass (same plan, warm) histograms
    // at 75% of it — two runs because "75% of final peak" is circular
    // within one run
    @volatile var histogramAt = Long.MaxValue
    val poller = new Thread(() => {
      while (running) {
        val used = mem.getHeapMemoryUsage.getUsed
        if (used > peak) peak = used
        if (used >= histogramAt && histogram.isEmpty) {
          try {
            val p = new ProcessBuilder("jcmd", pid.toString, "GC.class_histogram")
              .redirectErrorStream(true).start()
            val out = new String(p.getInputStream.readAllBytes())
            p.waitFor()
            histogram = out.linesIterator.take(30).toSeq
          } catch { case _: Throwable => histogram = Seq("jcmd unavailable") }
        }
        Thread.sleep(100)
      }
    })
    poller.setDaemon(true)
    poller.start()

    def runOnce(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = runOnce()
    val peakAfterCold = peak
    histogramAt = (peakAfterCold * 3) / 4
    val warm = runOnce()
    running = false

    val topStages = {
      import scala.jdk.CollectionConverters._
      stagePeak.asScala.toSeq.sortBy(-_._2._1).take(8).map {
        case (id, (bytes, nm)) =>
          f"""{"stage":$id,"peak_exec_mb":${bytes / 1048576}%d,"name":${jstr(nm)}}"""
      }
    }
    val histJson = histogram.map(jstr).mkString(",")
    println(
      // sum_task_peaks_mb sums per-task peakExecutionMemory across all
      // tasks and stages; task peaks are NOT simultaneous, so this
      // OVERSTATES concurrent executor memory (it bounds total booked
      // allocation, not a live peak) — the conflation verdict rests on
      // the <0.3 GB live histogram, not this number. Renamed from the
      // r17 record's misreadable "sum_peak_exec_mb".
      f"""{"what":"heap attribution of $name at $sfDir (round-17 ask #3)","cold_s":$cold%.1f,"warm_s":$warm%.1f,"heap_peak_mb":${peak / 1048576}%d,"sum_task_peaks_mb":${
        import scala.jdk.CollectionConverters._
        stagePeak.asScala.values.map(_._1).sum / 1048576
      }%d,"top_stages":[${topStages.mkString(",")}],"histogram_top":[$histJson]}""")
    spark.stop()
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
}
