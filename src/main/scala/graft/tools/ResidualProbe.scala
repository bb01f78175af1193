package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolates the in-sweep residual (late-sweep queries running ~1.5-2x their
  * fresh-JVM cost): runs a cheap PROBE query between rounds of heavy CHURN
  * queries, and after each churn round re-probes BEFORE and AFTER an
  * explicit System.gc() + ContextCleaner drain pause. If the probe recovers
  * only after the forced GC, the residual is collectible driver state
  * (cleaner backlog: shuffle/broadcast refs only released on GC — the
  * pre-touched Xms=Xmx heap GCs rarely, so the backlog persists); if it
  * never recovers, the residual is the box, not the JVM.
  *
  * `runMain graft.tools.ResidualProbe` — SPARK_GRAFT_SF_DIR as usual;
  * SPARK_GRAFT_PROFILE_CONF overlays session confs (e.g. the
  * spark.cleaner.periodicGC.interval A/B).
  */
object ResidualProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val probe = sys.env.getOrElse("SPARK_GRAFT_RESIDUAL_PROBE", "q_bin_header")
    val churn = Seq("q_ann_recall", "q_bm25_compact", "q_neardup_index",
      "q_llm_prep_e2e", "q_segy_dir_ingest", "q_store_compact", "q_quantize",
      "q_ingest_e2e", "q_stream_bm25", "q_segy_fmt28_roundtrip")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    sys.env.getOrElse("SPARK_GRAFT_PROFILE_CONF", "").split(",")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gcBean = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcCounts: (Long, Long) = {
      var n = 0L; var ms = 0L
      gcBean.forEach { g => n += g.getCollectionCount; ms += g.getCollectionTime }
      (n, ms)
    }
    def run(name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val snap = graft.core.TempDirs.snapshot()
      val t0 = System.nanoTime()
      graft.Bench.fullCount(fn(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      if (spark.streams.active.isEmpty) graft.core.TempDirs.releaseSince(snap): Unit
      dt
    }
    def loadavg: String =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0)
      catch { case _: Throwable => "?" }
    def probe3(tag: String): Unit = {
      val ts = (1 to 3).map(_ => run(probe)).sorted
      val (gn, gms) = gcCounts
      println(f"[probe/$tag] median ${ts(1)}%.2f s (min ${ts.head}%.2f max ${ts.last}%.2f) gc_n=$gn gc_ms=$gms load=$loadavg")
    }

    // warm-up: footer caches + first probe compile
    graft.core.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").foreach(_ => ())
      catch { case _: Throwable => () }
    }
    run(probe)
    probe3("t0-fresh")
    (1 to 2).foreach { round =>
      churn.foreach { q =>
        try { run(q); () } catch { case e: Throwable =>
          println(s"[churn] $q FAILED: ${e.getMessage}") }
      }
      probe3(s"t$round-postchurn")
      System.gc()
      Thread.sleep(3000) // let the ContextCleaner drain the reference queue
      probe3(s"t$round-postgc")
    }
    spark.stop()
  }
}
