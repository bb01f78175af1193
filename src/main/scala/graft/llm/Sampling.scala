package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * Random (`rand()`-based) sampling is irreproducible across runs, engines
  * and retries; production pipelines key the decision on a content/id hash
  * instead: a row is in the p-sample iff `hash(salt, id) mod M < p·M`. The
  * hash is md5-60 ([[graft.functions.CrossHash]]), so the same sample falls
  * out of any engine — and re-running after a crash keeps the identical
  * subset (idempotent restarts at 100 TB).
  */
object Sampling {

  private val M = 10000L // rate resolution: 0.01%

  /** The sampling bucket of a row: md5-60("salt:id") mod 10000. */
  def bucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 15), 16, 10)
      .cast("long") % M

  /** Uniform deterministic sample at `rate` ∈ [0, 1]. */
  def hashSample(df: DataFrame, rate: Double, idCol: String = "doc_id",
                 salt: String = "sample"): DataFrame =
    df.where(bucket(col(idCol), salt) < math.round(rate * M))

  /** Stratified deterministic sample: one rate per stratum value (absent
    * strata keep `defaultRate`). The mix recipe of a training-data pipeline:
    * e.g. keep 80% of curated sources, 5% of crawl.
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       idCol: String = "doc_id",
                       salt: String = "sample"): DataFrame = {
    val threshold = rates.foldLeft(lit(math.round(defaultRate * M)): Column) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(math.round(rate * M))).otherwise(acc)
    }
    df.where(bucket(col(idCol), salt) < threshold)
  }
}
