package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the quantize-then-zstd lossy-compression ratios at the
  * reference's six quality tiers (round-13 ask #5).
  *
  * The reference's `optimize_access_patterns` compresses lossy fast copies
  * with fixed-accuracy ZFP at tolerance = quality × std
  * (`optimize/common.py:31-53`, quality ∈ {6,3,1,0.1,0.01,0.001}) and its
  * CLI cites ~10× size reduction for lossy mode
  * (`commands/segy.py:198-205`). This engine's documented approximation is
  * `round(x / 2tol)·2tol` then Parquet zstd
  * ([[graft.operators.AccessPatterns.quantize]]) — this main puts a NUMBER
  * on that divergence so a user choosing `--lossless false` knows what
  * they get here vs the reference's claim.
  *
  * Amplitude fixture: the same seismic-ish synthesis the ingest queries
  * use (lineitem-derived), as float32 — a smooth structured term plus
  * full-entropy fractional noise, so lossless parquet cannot cheat via
  * trivially repeating mantissas.
  *
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.CompressionStudy` →
  * markdown table on stdout + JSON at SPARK_GRAFT_COMP_OUT
  * (default bench/compression_ratios.json).
  */
object CompressionStudy {

  val Qualities: Seq[Double] = Seq(6.0, 3.0, 1.0, 0.1, 0.01, 0.001)

  private def dirSize(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** max|x − quantize(x)| over the sample arrays — must be ≤ tolerance. */
  private def maxErr(df: DataFrame, tol: Double): Double =
    df.select(max(aggregate(
      transform(col("samples"), x =>
        abs(x - graft.operators.AccessPatterns.quantize(x, tol))),
      lit(0.0), (acc, e) => greatest(acc, e))))
      .head().getDouble(0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // seismic-ish float32 TRACES (the real store layout: one row per
    // trace, array<float> samples — the file is amplitude-dominated, so
    // ratios measure the VALUE payload, not flat-key overhead):
    // reflectivity-like structure along the trace + noise with full
    // mantissa entropy (hash-derived), scaled to std ~1000 like field data
    val nSamples = 128
    val amp = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("trace"))
      .distinct()
      .select(col("trace"),
        transform(sequence(lit(1), lit(nSamples)), i =>
          (sin(col("trace") / 50.0 + i / 9.0) * 800.0 +
            cos(col("trace") / 7.0 + i) * 400.0 +
            (hash(col("trace"), i).cast("double") / 4294967296.0) * 300.0)
            .cast("float")).as("samples"))
      .cache()
    val nTraces = amp.count()
    val n = nTraces * nSamples
    val std = amp.select(explode(col("samples")).as("x"))
      .agg(stddev(col("x"))).head().getDouble(0)

    val base = graft.core.TempDirs.scratch("compstudy")
    val lossless = s"$base/lossless"
    amp.write.mode("overwrite").option("compression", "zstd").parquet(lossless)
    val losslessBytes = dirSize(spark, lossless)
    val rawBytes = n * 4 // the amplitude payload: float32 per sample

    println(s"traces=$nTraces samples=$n std=$std " +
      s"lossless_zstd=${losslessBytes}B raw=${rawBytes}B")
    println("| quality | tolerance = q·std | size (B) | vs lossless | vs raw | max abs err |")
    println("|---|---|---|---|---|---|")
    val rows = Qualities.map { q =>
      val tol = q * std
      val path = s"$base/q_$q"
      amp.withColumn("samples",
          transform(col("samples"), x =>
            graft.operators.AccessPatterns.quantize(x, tol).cast("float")))
        .write.mode("overwrite").option("compression", "zstd").parquet(path)
      val bytes = dirSize(spark, path)
      val err = maxErr(amp, tol)
      require(err <= tol + 1e-9, s"quantize exceeded tolerance: $err > $tol")
      println(f"| $q | $tol%.4f | $bytes | ${losslessBytes.toDouble / bytes}%.1fx " +
        f"| ${rawBytes.toDouble / bytes}%.1fx | $err%.4f |")
      f"""{"quality":$q,"tolerance":$tol%.6f,"bytes":$bytes,""" +
        f""""ratio_vs_lossless":${losslessBytes.toDouble / bytes}%.2f,""" +
        f""""ratio_vs_raw":${rawBytes.toDouble / bytes}%.2f,"max_abs_err":$err%.6f}"""
    }
    val out = sys.env.getOrElse("SPARK_GRAFT_COMP_OUT", "bench/compression_ratios.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      s"""{"sf":"$sfDir","traces":$nTraces,"samples":$n,"std":$std,""" +
        s""""lossless_zstd_bytes":$losslessBytes,""" +
        s""""raw_bytes":$rawBytes,"tiers":[${rows.mkString(",")}]}""" + "\n")
    spark.stop()
  }
}
