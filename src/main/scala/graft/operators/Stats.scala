package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Summary statistics — the reference's per-block partial stats + merge +
  * derived values.
  *
  * A1 per-block partials (reference `segy/_workers.py:179-194`): masked
  * (non-zero) count, min, max, sum, sum-of-squares. A2 merge
  * (`segy/blocked_io.py:41-51`) is Spark's final aggregation step — partial
  * and final aggregation are built in. A3 derived stats
  * (`builder/schemas/v1/stats.py:58-71`): mean = sum/count,
  * variance = sumsq/count − mean² (the reference's naive formula, kept for
  * oracle parity), std = √variance.
  *
  * Determinism note: double addition is not associative, so a parallel sum of
  * doubles is run-dependent. The fixture's value columns are exact 2-decimal
  * values, so we accumulate in DECIMAL (exact, order-independent) and cast the
  * final sums back to double — bit-identical across engines and runs. At
  * 100 TB this costs one decimal add per row in the partial aggregate; still
  * a single-pass, map-side-combined hash aggregate.
  */
object Stats {

  /** A1–A3 in one pass over the non-zero mask of `valueCol`. */
  def summaryStats(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol)
    val xd = x.cast(DecimalType(18, 2))
    // DECIMAL → STRING → DOUBLE, not DECIMAL → DOUBLE: once the exact sum
    // exceeds 2^53 the decimal→double conversion is engine-dependent (DuckDB
    // is off by 1 ulp from the JVM's correctly-rounded BigDecimal path), but
    // string→double parsing is correctly rounded everywhere — bit-identical
    // at any scale factor.
    df.where(x.isNotNull && x =!= 0.0)
      .agg(
        count(x).as("n"),
        min(x).as("min_val"),
        max(x).as("max_val"),
        sum(xd).cast("string").cast("double").as("sum_val"),
        sum(xd * xd).cast("string").cast("double").as("sumsq_val"),
      )
      // NULL derived stats on an empty/all-masked input — ANSI mode throws
      // on the division otherwise (the n > 0 branch is unchanged)
      .withColumn("mean_val", when(col("n") > 0, col("sum_val") / col("n")))
      .withColumn("var_val", when(col("n") > 0,
        col("sumsq_val") / col("n") - col("mean_val") * col("mean_val")))
      .withColumn("std_val", sqrt(col("var_val")))
  }

  /** Equal-width histogram over [lo, hi): bucket index by direct arithmetic
    * (no UDF, no custom aggregate — a groupBy over the computed bucket is
    * Spark's partial/final combine). Values outside the range clamp to the
    * edge buckets, like numpy's histogram with explicit range.
    * Complements `SummaryStatistics.histogram`
    * (`builder/schemas/v1/stats.py:26-45`; reference ingestion writes an
    * empty histogram — `segy/_workers.py:186-194` — this is the query-side
    * operator).
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int,
                lo: Double, hi: Double): DataFrame = {
    require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
    val x = col(valueCol)
    val raw = floor((x - lo) / (hi - lo) * nBins)
    val bucket = least(greatest(raw, lit(0.0)), lit((nBins - 1).toDouble)).cast("long")
    df.where(x.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bucket") * ((hi - lo) / nBins))
  }
}
