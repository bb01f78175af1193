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
    graft.functions.CrossHashExprs.md5h60(
      concat(lit(salt + ":"), id.cast("string"))) % M

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

  /** Mixture sampling to a TOKEN budget — the recipe step that turns
    * "train on 50% curated, 25% web, 12.5% code" plus a total token count
    * into per-document keep decisions. Each source's keep rate is
    * `min(1, share·budget / sourceTokens)` (sources outside the recipe
    * drop entirely), then rows sample deterministically by the same
    * md5-60 bucket as [[hashSample]] — so the realized mixture tracks the
    * target in expectation while staying reproducible across engines,
    * retries and appends. Oversubscribed sources (share·budget beyond
    * what the source has) clamp to keep-everything; re-balancing the
    * shortfall across the remaining sources is a recipe decision, not
    * this operator's.
    *
    * Scale shape: token counts are a narrow codegen'd map; the per-source
    * totals aggregate is source-table-sized (map-side combine) and joins
    * back broadcast, so the corpus is scanned once and never shuffled.
    *
    * Emits the sampled manifest (idCol, srcCol, n_tokens).
    */
  def mixtureSample(docs: DataFrame, shares: Map[String, Double],
                    tokenBudget: Long, srcCol: String = "source",
                    textCol: String = "text", idCol: String = "doc_id",
                    salt: String = "mix"): DataFrame = {
    require(shares.nonEmpty, "mixtureSample needs at least one source share")
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val counted = docs.select(col(idCol), col(srcCol),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    val totals = counted.groupBy(col(srcCol))
      .agg(sum("n_tokens").cast("long").as("src_tokens"))
    // target tokens per source as a double literal (share · budget is
    // folded HERE, once, so the oracle inlines the identical constant)
    val target = shares.foldLeft(lit(0.0): Column) { case (acc, (src, share)) =>
      when(col(srcCol) === src, lit(share * tokenBudget)).otherwise(acc)
    }
    counted.join(broadcast(totals), srcCol)
      // zero-token sources must drop, not divide: target/0.0 is Inf (or
      // NaN off-recipe), and least() treats NaN as LARGER than any double,
      // so the unguarded rate would keep every doc of such a source
      .withColumn("rate",
        when(col("src_tokens") === 0, lit(0.0))
          .otherwise(least(lit(1.0), target / col("src_tokens").cast("double"))))
      .where(bucket(col(idCol), salt) <
        floor(col("rate") * lit(M.toDouble)).cast("long"))
      .select(col(idCol), col(srcCol), col("n_tokens"))
  }

  /** Deterministic per-group cap — "at most N docs per domain/source", the
    * standard anti-dominance gate in crawl pipelines: rows rank within
    * their group by (md5-60("cap:id"), id) — a reproducible pseudo-random
    * order, so the kept set is stable across reruns, retries and engines —
    * and ranks above `cap` drop. One shuffle on the group key; groups
    * bigger than a task's memory stream through the rank window fine
    * (no collect, no array build).
    */
  def capPerGroup(df: DataFrame, groupCol: String, cap: Int,
                  idCol: String = "doc_id",
                  salt: String = "cap"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val h = graft.functions.CrossHashExprs.md5h60(
      concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= cap)
      .drop("_rk")
  }
}
