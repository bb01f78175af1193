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

  /** max|x − quantize(x)| measured on the data — must be ≤ tolerance. */
  private def maxErr(df: DataFrame, tol: Double): Double =
    df.select(max(abs(col("amplitude") -
      graft.operators.AccessPatterns.quantize(col("amplitude"), tol))))
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

    // seismic-ish float32 amplitudes: reflectivity-like structure along
    // the trace axis + noise with full mantissa entropy (hash-derived
    // uniform in [-0.5, 0.5)), scaled to std ~1000 like real field data
    val amp = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("trace"), col("l_linenumber").as("pos"),
        ((sin(col("l_orderkey") / 50.0) * 800.0 +
          cos(col("l_orderkey") / 7.0 + col("l_linenumber")) * 400.0 +
          (hash(col("l_orderkey"), col("l_linenumber")).cast("double") / 4294967296.0) * 300.0)
          .cast("float")).as("amplitude"))
      .cache()
    val n = amp.count()
    val std = amp.select(stddev(col("amplitude"))).head().getDouble(0)

    val base = graft.core.TempDirs.scratch("compstudy")
    val lossless = s"$base/lossless"
    amp.write.mode("overwrite").option("compression", "zstd").parquet(lossless)
    val losslessBytes = dirSize(spark, lossless)
    val rawBytes = n * (8 + 4 + 4) // schema payload: long + int + float

    println(s"rows=$n std=$std lossless_zstd=${losslessBytes}B raw=${rawBytes}B")
    println("| quality | tolerance = q·std | size (B) | vs lossless | vs raw | max abs err |")
    println("|---|---|---|---|---|---|")
    val rows = Qualities.map { q =>
      val tol = q * std
      val path = s"$base/q_$q"
      amp.withColumn("amplitude",
          graft.operators.AccessPatterns.quantize(col("amplitude"), tol)
            .cast("float"))
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
      s"""{"sf":"$sfDir","rows":$n,"std":$std,"lossless_zstd_bytes":$losslessBytes,""" +
        s""""raw_bytes":$rawBytes,"tiers":[${rows.mkString(",")}]}""" + "\n")
    spark.stop()
  }
}
