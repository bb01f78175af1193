package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A failed query reports ok=false and counts its
  * elapsed time — failures can NOT masquerade as fast successes (each query
  * value is an object {"sec":…,"ok":…,"rows":…}; "value" totals only the OK
  * queries' seconds).
  *
  * The same JSON line is also written to SPARK_GRAFT_BENCH_OUT (default
  * `bench_out.json` in the working directory) so the record never depends
  * on log-tail capture. Optional args = query names to run (a focused
  * re-bench); the recorded file is only written for full runs.
  */
object Bench {

  /** Execute a query's FULL result and return its row count.
    *
    * `df.count()` — the action rounds 1–12 timed — lets Catalyst prune
    * every column the count doesn't need, so a pure-projection query
    * (q_proj, the trace-conditioning family, decode paths) timed as a
    * near-no-op: q_trace_agc_long "ran" in 0.12 s while its real work is
    * ~10¹¹ multiply-adds. Running the query's own optimized plan to
    * InternalRows (`queryExecution.toRdd`) keeps the projection as the
    * plan root — nothing above it to prune through — and adds no
    * shuffle, sink or row conversion, so aggregate/join queries time the
    * same as before and projection queries finally time their work.
    */
  def fullCount(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // split small files down to ~128 KB so narrow compute-heavy chains
      // parallelize even over MB-scale fixtures: the default 4 MB
      // open-cost makes an 11 MB table ~3 splits, serializing per-row
      // kernels on 2% of the machine (at real scale the files split
      // naturally; this knob only matters for small inputs)
      .config("spark.sql.files.openCostInBytes", "131072")
      // ObjectHashAggregate falls back to SORT-based aggregation after
      // 128 distinct keys per task — for the trace aggregates that means
      // sorting the 8 KB sample rows themselves (q_trace_stack_long:
      // 1000 cells, ~5 GB sorted+spilled per pass; measured 4–57 s run
      // swings from this alone). The buffers are ~8–24 KB per group, so
      // 4096 in-flight groups is ≤ ~100 MB per task — raise the
      // threshold so the hash path holds
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      // The 178-query sweep compiles thousands of DISTINCT whole-stage
      // codegen units; the default 100-entry generated-class cache
      // (spark.sql.codegen.cache.maxEntries) thrashes, so late-sweep
      // queries re-Janino-compile every stage on every run — measured
      // in-sweep q_ann_recall at 14.1 s vs 5.1 s in a fresh JVM running
      // only that query. 10k entries holds the whole suite (generated
      // classes are KB-scale; a long-lived production driver serving many
      // query shapes wants the same).
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // Guide §3.1/§9: allow shuffled-hash join where the per-partition
      // build side fits instead of always sort-merging — A/B over the
      // join-heavy queries (repeats=5, same box, same session):
      // q_llm_prep_e2e 5.79→3.84, q_dedup_components_best 2.37→1.93,
      // q_jaccard_blocked 2.11→1.87, none slower. Scale note: the skipped
      // sort is pure win while a partition's build side fits in task
      // memory; partitions are AQE-sized, and the salted/capped operators
      // bound the hot keys, so the fit assumption is the same one the
      // engine already documents for its aggregation buffers.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The long trace fixtures (q_moveout_*_long) key their by-cell
    // repartition on `l_suppkey % 512` — one state buffer per cell,
    // co-partitioned with the aggregate, so boxes up to 512 cores stay
    // fully busy. Past that the fixtures silently cap busy tasks and the
    // bench under-reports per-core throughput — refuse loudly (the same
    // guard that existed at the old 64-cell modulus): raise the modulus
    // (mirrored in the oracle SQL) rather than the partition count.
    require(spark.sparkContext.defaultParallelism <= 512,
      s"moveout-long fixtures key on l_suppkey % 512 but this box " +
        s"schedules ${spark.sparkContext.defaultParallelism} tasks — " +
        "raise the fixture modulus (and its oracle SQL mirror) before " +
        "benching on this machine")

    // Warm the file-system/footer caches once so per-query times measure the
    // query, not first-touch metadata I/O.
    graft.core.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").foreach(_ => ())
      catch { case _: Throwable => () }
    }
    // ... and JIT/codegen: the alphabetically-first timed queries would
    // otherwise absorb the whole JVM warmup (~2s measured — it made the
    // first query look 2× its steady-state cost). Four untimed
    // representatives warm the aggregate, kernel-expression,
    // parquet-write and generate+window+fold paths.
    Seq("q_stats", "q_simhash", "q_store_roundtrip", "q_keywords").foreach { q =>
      SparkEntry.queries.get(q).foreach(fn =>
        try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () })
    }

    // Box-health controls: a bench total is only comparable across rounds
    // if the box was equally healthy both days — two consecutive closing
    // records (r14's outlier, r15's 222.9 s) needed prose to explain a
    // degraded-I/O day. Formalized here: a fixed set of RARELY-TOUCHED
    // queries runs median-of-3 BEFORE and AFTER the timed sweep and both
    // medians land in the record itself, so any future reader can
    // normalize a total against the controls' drift from their historical
    // ~1.5 s / ~0.4 s / ~2.3 s instead of trusting the round's prose.
    // Empty SPARK_GRAFT_BENCH_CONTROLS disables (focused re-benches).
    val controlSet = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTROLS",
      if (args.isEmpty) "q_dedup_components_best,q_stats,q_bm25" else "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    def controlPass(): Seq[(String, Double)] = controlSet.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val secs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          try { fullCount(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 } // a broken control reads -1,
                                              // never kills the record
        }.sorted
        name -> secs(1)
      }
    }
    val controlsPre = controlPass()

    // SPARK_GRAFT_BENCH_REPEATS > 1 → each query runs N times BACK TO
    // BACK and reports the per-query MEDIAN plus the min–max spread:
    // same-day full-suite totals vary ±20% run-to-run on this box, so
    // single-run per-query comparisons across code changes sit inside
    // noise — the clean committed record uses median-of-3. Consecutive
    // (not whole-suite-interleaved) repeats keep a query's warm state
    // (JIT, file/footer caches) comparable across its repetitions; each
    // repetition rebuilds its own scratch indexes (paths are UUID-fresh),
    // so per-query scratch release below never invalidates a repeat.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "1").toInt
    require(repeats >= 1, s"SPARK_GRAFT_BENCH_REPEATS must be >= 1, got $repeats")
    // Per-query box snapshot, taken immediately before the first timed
    // repeat: the r18 driver record carried a 127 s outlier (my clean
    // repro: 2.3 s) that cost a judge-session to attribute to concurrent
    // load — a timestamp + loadavg + MemAvailable in the record itself
    // rules that in or out from the file.
    def loadAvg1m(): Double =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def memAvailMb(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/meminfo")
        try src.getLines().find(_.startsWith("MemAvailable:"))
          .map(_.trim.split("\\s+")(1).toLong / 1024).getOrElse(-1L)
        finally src.close()
      } catch { case _: Throwable => -1L }
    case class R(sec: Double, ok: Boolean, rows: Long, spread: Double,
                 tStartMs: Long, load: Double, memMb: Long)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.contains).toMap
    val results: Seq[(String, R)] = selected.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        // scratch dirs are deleted only at JVM exit by default; a full
        // sweep accumulates them unboundedly (the round-17 sf10 war
        // story: four SEG-Y round-trips = 77 GB, starving the LSH
        // family). Every run here fully consumes its frame (fullCount)
        // and no query reads another query's scratch (paths are
        // UUID-fresh per call), so releasing AFTER a query's repeats is
        // safe — the release brackets the repeats, never splits them.
        val scratchSnap = graft.core.TempDirs.snapshot()
        val (tStartMs, load, memMb) =
          (System.currentTimeMillis(), loadAvg1m(), memAvailMb())
        val runs = (1 to repeats).map { _ =>
          val t0 = System.nanoTime()
          try { val n = fullCount(fn(spark, sfDir)); ((System.nanoTime() - t0) / 1e9, true, n) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            ((System.nanoTime() - t0) / 1e9, false, -1L)
          }
        }
        // enforced safety condition (not just commented): a still-active
        // stream may hold reads against registered scratch — leave its
        // paths for the exit hook rather than delete under it
        if (spark.streams.active.isEmpty)
          graft.core.TempDirs.releaseSince(scratchSnap): Unit
        else
          System.err.println(s"[bench] $name: streams still active — " +
            "skipping scratch release for this query")
        val secs = runs.map(_._1).sorted
        val median = secs(secs.size / 2)
        name -> R(median, runs.forall(_._2),
          runs.find(_._2).map(_._3).getOrElse(-1L),
          secs.last - secs.head, tStartMs, load, memMb)
    }
    val qs = results.map { case (k, r) =>
      val spreadJson = if (repeats > 1) s""","spread":${r.spread}""" else ""
      s""""$k":{"sec":${r.sec},"ok":${r.ok},"rows":${r.rows}$spreadJson""" +
        s""","t_start_ms":${r.tStartMs},"loadavg":${r.load}""" +
        s""","mem_avail_mb":${r.memMb}}"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, r) if r.ok => r.sec }.sum
    val nFail = results.count(!_._2.ok)
    val controlsPost = controlPass()
    val controlsJson =
      if (controlSet.isEmpty) ""
      else {
        def block(xs: Seq[(String, Double)]) =
          xs.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
        s""","controls":{"pre":${block(controlsPre)},"post":${block(controlsPost)}}"""
      }
    // post-sweep scratch footprint: with per-query release this is bounded
    // by the LAST query's residue (0 in practice), not the whole sweep's.
    // null = at least one registered path was unmeasurable (remote scheme
    // without credentials, walk error) — unknown, not zero.
    val scratchBytes =
      graft.core.TempDirs.liveBytes().map(_.toString).getOrElse("null")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_failed":$nFail,"repeats":$repeats$controlsJson,"scratch_live_bytes":$scratchBytes,"sf":"$sfDir"}"""
    println(line)
    if (args.isEmpty) {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    }
    spark.stop()
  }
}
