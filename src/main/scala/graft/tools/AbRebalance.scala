package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session A/B of the rebalance row gate (round-17 ask #1b): the r16
  * guard spread EVERY few-file under-2-GiB scan, which regressed the two
  * touched sf0.1 queries q_stream_ann_lsh 1.54→2.52 s and q_sq_codes
  * 0.22→0.48 s (tiny tables gain nothing from 32 tasks). The footer-based
  * guard gates on exact row counts; this tool measures the gate's effect.
  *
  * Variants share one JVM/session (the conf is read per rebalance call):
  *   pre         — minRows=0, minRowsHeavy=0 (always spread; r16 behavior)
  *   shipped     — minRows=4096, minRowsHeavy=512 (the Scratch.scala
  *                 defaults: vector kernels gate at 4096 so the 2,000-row
  *                 embeddings table doesn't spread; tokenize/shingle
  *                 kernels gate at 512 so 5,000-doc documents still does)
  *   uniform4096 — minRows=4096, minRowsHeavy=4096 (the weight-blind gate
  *                 the A/B rejected: it cost q_bm25 1.41→2.25 s)
  * Rounds interleave variants to cancel box drift; controls (q_stats,
  * q_trace_agc_long, q_funnel) never touch rebalance.
  *
  * `runMain graft.tools.AbRebalance [reps]` → one JSON line for
  * bench/ab_rebalance_r17.json. SPARK_GRAFT_SF_DIR picks the scale.
  */
object AbRebalance {
  private val Touched = Seq("q_sq_codes", "q_stream_ann_lsh", "q_bm25", "q_ann_ivf",
    "q_stream_bm25", "q_bm25_compact")
  private val Controls = Seq("q_stats", "q_trace_agc_long", "q_funnel")
  // (name, minRows for vector kernels, minRowsHeavy for tokenize/shingle)
  private val Variants = Seq(("pre", "0", "0"), ("shipped", "4096", "512"),
    ("uniform4096", "4096", "4096"))

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Touched ++ Controls

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: one untimed pass per query (JIT, codegen cache, FS cache)
    names.foreach(runOnce)

    val times = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    (1 to reps).foreach { rep =>
      Variants.foreach { case (variant, minRows, minRowsHeavy) =>
        spark.conf.set("graft.rebalance.minRows", minRows)
        spark.conf.set("graft.rebalance.minRowsHeavy", minRowsHeavy)
        names.foreach { name =>
          val s = runOnce(name)
          times((variant, name)) = s :: times((variant, name))
          println(f"[ab] rep $rep $variant%-8s $name%-20s $s%6.3f s")
        }
      }
    }
    spark.conf.unset("graft.rebalance.minRows"); spark.conf.unset("graft.rebalance.minRowsHeavy")

    def median(xs: List[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val what = "same-session A/B of the rebalance footer row gate " +
      "(round-17): pre = minRows=0 (always spread, r16 behavior), " +
      "shipped = minRows 4096/minRowsHeavy 512, uniform4096 = both 4096; " +
      "variants interleaved " +
      s"round-robin, median-of-$reps, controls never touch rebalance. " +
      s"sfDir=$sfDir"
    val body = Variants.map { case (variant, _, _) =>
      val qs = names.map { n =>
        val xs = times((variant, n))
        f""""$n":{"sec":${median(xs)}%.3f,"spread":${xs.max - xs.min}%.3f}"""
      }.mkString(",")
      s""""$variant":{$qs}"""
    }.mkString(",")
    println(s"""{"what":"$what","controls":[${Controls.map("\"" + _ + "\"").mkString(",")}],$body}""")
    spark.stop()
  }
}
