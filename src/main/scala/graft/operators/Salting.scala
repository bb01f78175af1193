package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware aggregation: two-phase salted groupBy.
  *
  * At 100 TB a handful of hot keys (one survey line with 100× the fold, one
  * document source with most of the corpus) can funnel a groupBy into a few
  * straggler tasks. Salting splits each key into `saltBuckets` sub-keys for
  * the partial aggregate, then merges the partials in a second (tiny)
  * aggregate keyed by the real key. Both phases keep map-side combine; the
  * result is identical to the unsalted aggregate for decomposable aggregates
  * (sum/count/min/max).
  *
  * AQE's skew-join handling covers joins; this covers aggregation skew,
  * which AQE does not rebalance.
  */
object Salting {

  /** Salted sum/count aggregate over one key column. The salt is derived
    * from a hash of stable columns (not rand()) so results are deterministic
    * and retries are safe.
    */
  def saltedAgg(df: DataFrame, key: String, sumCol: Column, sumName: String,
                saltBuckets: Int = 16, saltSource: Seq[String] = Nil): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val saltCols = if (saltSource.nonEmpty) saltSource.map(col) else df.columns.toSeq.map(col)
    val salt = pmod(xxhash64(saltCols: _*), lit(saltBuckets))
    df.withColumn("_salt", salt)
      .groupBy(col(key), col("_salt"))                         // phase 1: skew split
      .agg(sumCol.as("_partial_sum"), count(lit(1)).as("_partial_n"))
      .groupBy(col(key))                                       // phase 2: tiny merge
      .agg(sum(col("_partial_sum")).as(sumName),
           sum(col("_partial_n")).as("n_rows"))
  }
}
