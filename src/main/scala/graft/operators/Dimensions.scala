package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimension inference — the reference's grid-coordinate layer.
  *
  * G1 `compute_dimensions` (reference `ingestion/segy/index_strategies.py:83-90`,
  * `core/dimension.py:17-77`): per dimension name, the sorted distinct
  * coordinate vector. A5 dim min/max (reference `core/grid.py:87-93`,
  * `commands/info.py:74-83`).
  *
  * Spark notes at scale: `distinct` is a hash-partial + final aggregate — the
  * map-side combine collapses each input partition to its local distinct set
  * before the shuffle, so shuffle volume is O(cardinality), not O(rows).
  * The `orderBy` is a range-partitioned sort over the already-distinct set.
  */
object Dimensions {

  /** Sorted distinct values of one dimension column (G1). */
  def computeDimension(df: DataFrame, dim: String): DataFrame =
    df.select(col(dim).as("dim_value")).distinct().orderBy(col("dim_value"))

  /** Per-dimension summary: min / max / cardinality (A5, S8 "info"). All three
    * aggregates run in ONE pass; countDistinct becomes a two-phase expand
    * aggregate with partial combine — no extra scan per dimension.
    */
  def dimSummary(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = dims.flatMap { d =>
      Seq(min(col(d)).as(s"${d}_min"),
          max(col(d)).as(s"${d}_max"),
          countDistinct(col(d)).as(s"${d}_n"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
