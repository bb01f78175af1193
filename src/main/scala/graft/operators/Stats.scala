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

  /** EXACT global quantiles WITHOUT a global sort — the scale path for the
    * one aggregate where "exact" usually means "sort 100 TB": quantile q =
    * the rank-⌈q·N⌉ smallest non-null value (1-based — the same convention
    * [[graft.llm.TextAnalysis.lengthQuantiles]] uses per key).
    *
    * Two (worst-case three) bounded passes:
    *   1. count/min/max + a fixed-width histogram (one map-side-combined
    *      aggregate; nBuckets counts collect to the driver — parameter-sized);
    *   2. each target rank locates its bucket by prefix sums; a bucket
    *      bigger than `refineLimit` re-histograms ONCE within its value
    *      range (handles heavy skew; a single repeated value short-circuits
    *      because the sub-range collapses to min == max);
    *   3. the rank-r-within-bucket value = distributed top-(local r) over
    *      ONLY that bucket's rows — the bucket filter is a RANGE predicate
    *      on the value, so it pushes into the parquet scan (row-group
    *      min/max pruning), and the top-k never exceeds `refineLimit` rows.
    *
    * Correctness does not depend on the bucketing arithmetic: floor
    * bucketing is monotone, equal values share a bucket, and the local rank
    * is derived from the SAME counts that routed the rows. Emits one row:
    * (n, p<label>...) with the value column's native type preserved.
    */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.99),
                     nBuckets: Int = 4096,
                     refineLimit: Long = 1 << 20): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $quantiles")
    require(quantiles.map(q => math.round(q * 100)).distinct.size == quantiles.size,
      s"quantile labels p<round(q*100)> must be distinct, got $quantiles")
    require(nBuckets > 1, s"need nBuckets > 1, got $nBuckets")
    val spark = df.sparkSession
    val x = col(valueCol)
    val base = df.where(x.isNotNull).select(x.as("x"))

    val head = base.agg(count(lit(1)).as("n"),
      min(col("x")).cast("double").as("lo"),
      max(col("x")).cast("double").as("hi")).collect().head
    val n = head.getLong(0)
    require(n > 0, s"exactQuantiles: no non-null rows in $valueCol")
    val labels = quantiles.map(q => s"p${math.round(q * 100)}")

    /** rank-r smallest (1-based) within `slice`, whose value range is
      * [sLo, sHi] and row count `cnt`. Buckets route by the floor
      * expression and the recursion slices by THAT SAME expression —
      * never by arithmetic range bounds, which can disagree with the
      * floor at bucket edges — plus a deliberately loose redundant range
      * predicate purely for parquet row-group pruning.
      */
    def select(slice: DataFrame, sLo: Double, sHi: Double, r: Long,
               cnt: Long, depth: Int): Any = {
      if (sLo == sHi) sLo // constant slice: every rank is the value
      else if (cnt <= refineLimit || depth >= 1) {
        // distributed top-r (TakeOrdered) over the pruned slice — bounded
        // by refineLimit, or one refine level already spent
        slice.orderBy(col("x")).limit(math.min(r, Int.MaxValue).toInt)
          .agg(max(col("x"))).collect().head.get(0)
      } else {
        val w = (sHi - sLo) / nBuckets
        val raw = floor((col("x") - sLo) / w)
        val b = least(greatest(raw, lit(0.0)), lit((nBuckets - 1).toDouble)).cast("int")
        val counts = slice.groupBy(b.as("b")).agg(count(lit(1)).as("c"))
          .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
        var cum = 0L
        var bi = 0
        while (bi < nBuckets && cum + counts.getOrElse(bi, 0L) < r) {
          cum += counts.getOrElse(bi, 0L); bi += 1
        }
        val sub = slice
          .where(col("x") >= sLo + (bi - 1) * w && col("x") <= sLo + (bi + 2) * w)
          .where(b === bi)
        val bounds = sub.agg(min(col("x")).cast("double"),
          max(col("x")).cast("double")).collect().head
        select(sub, bounds.getDouble(0), bounds.getDouble(1),
          r - cum, counts.getOrElse(bi, 0L), depth + 1)
      }
    }

    val picks = quantiles.zip(labels).map { case (q, lab) =>
      val r = math.ceil(q * n).toLong
      lit(select(base, head.getDouble(1), head.getDouble(2), r, n, depth = 0))
        .cast(df.schema(valueCol).dataType).as(lab)
    }
    val one = spark.range(1)
    one.select((lit(n).as("n") +: picks): _*)
  }
}
