package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Geometry aggregations (A4) — the group-level summaries that feed the
  * reference's geometry decisions.
  *
  * Reference: per-cable channel min/max `header_analysis.py:82-139`
  * (`analyze_streamer_headers`), per-line gun/shot uniqueness
  * `header_analysis.py:142-191` (`analyze_lines_for_guns`).
  *
  * Scale: plain hash aggregates with map-side partial combine; output is one
  * row per group (cables/lines — metadata-sized).
  */
object Geometry {

  /** Per-group min/max of a value + distinct count of a second key. */
  def groupRanges(df: DataFrame, group: String, value: String, distinctKey: String): DataFrame =
    df.groupBy(col(group))
      .agg(
        min(col(value)).as("v_min"),
        max(col(value)).as("v_max"),
        countDistinct(col(distinctKey)).as("n_distinct"),
        count(lit(1)).as("n_rows"),
      )

  /** Per-(line, gun) unique-shot counts — `analyze_lines_for_guns` shape. */
  def gunShotCounts(df: DataFrame, line: String, gun: String, shot: String): DataFrame =
    df.groupBy(col(line), col(gun))
      .agg(countDistinct(col(shot)).as("n_shots"), count(lit(1)).as("n_rows"))
}
