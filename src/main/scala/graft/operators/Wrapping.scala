package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geometry detection + channel/shot renumbering (the reference's most
  * interesting relational operators).
  *
  * G5 `ChannelWrappingStrategy` (reference `ingestion/segy/
  * index_strategies.py:206-233`, detection `header_analysis.py:82-139`):
  * decide whether channel numbering restarts per cable (geometry Type A —
  * per-cable ranges overlap) or runs sequentially across cables (Type B);
  * if B, rebase channel to 1..N per cable.
  *
  * G6 `ShotWrappingStrategy` (`index_strategies.py:236-299`, detection
  * `header_analysis.py:142-191`): emit a dense per-line `shot_index`, either
  * by `searchsorted` over the line's sorted unique shots (Type A — in Spark
  * exactly `dense_rank()-1` per line) or by gun-aware floor-division rebase
  * (Type B).
  *
  * Scale: detection aggregates to one row per cable/line (a metadata-sized
  * table); the pairwise overlap test runs as a self-join of that tiny
  * aggregate — broadcast, never a shuffle of trace rows. Rebasing is a
  * window min / dense_rank: one hash-shuffle on the group key.
  */
object Wrapping {

  /** G5 detection input: per-cable channel range. */
  def channelRanges(df: DataFrame, cable: String, channel: String): DataFrame =
    df.groupBy(col(cable))
      .agg(min(col(channel)).as("chan_min"), max(col(channel)).as("chan_max"))

  /** G5 detection: do any two cables' channel ranges overlap?
    * Ranges overlap ⇒ channels restart per cable (Type A, no rebase needed);
    * disjoint ⇒ sequential numbering (Type B, rebase required).
    * Returns one row: (n_cables, has_overlap, geometry_type).
    */
  def detectChannelGeometry(df: DataFrame, cable: String, channel: String): DataFrame = {
    val ranges = channelRanges(df, cable, channel)
    val a = ranges.select(col(cable).as("cable_a"), col("chan_min").as("min_a"),
                          col("chan_max").as("max_a"))
    val b = ranges.select(col(cable).as("cable_b"), col("chan_min").as("min_b"),
                          col("chan_max").as("max_b"))
    val overlaps = a.join(broadcast(b), col("cable_a") < col("cable_b"))
      .where(col("min_a") <= col("max_b") && col("min_b") <= col("max_a"))
    val nCables = ranges.agg(count(lit(1))).first().getLong(0)
    val hasOverlap = overlaps.limit(1).count() > 0
    val sess = df.sparkSession
    import sess.implicits._
    Seq((nCables, hasOverlap, if (hasOverlap) "A" else "B"))
      .toDF("n_cables", "has_overlap", "geometry_type")
  }

  /** G5 rebase: channel → 1..N within each cable (`v - min(v) + 1`). */
  def rebaseChannels(df: DataFrame, cable: String, channel: String,
                     out: String = "channel_wrapped"): DataFrame = {
    val w = Window.partitionBy(col(cable))
    df.withColumn(out, (col(channel) - min(col(channel)).over(w) + 1).cast("long"))
  }

  /** G6 Type A: dense 0-based shot index per line — exact `searchsorted` over
    * the line's sorted uniques, because dense_rank ranks distinct values.
    */
  def shotIndexDenseRank(df: DataFrame, line: String, shot: String,
                         out: String = "shot_index"): DataFrame = {
    val w = Window.partitionBy(col(line)).orderBy(col(shot))
    df.withColumn(out, (dense_rank().over(w) - 1).cast("long"))
  }

  /** G6 Type B: gun-interleaved numbering — floor-divide by gun count, then
    * rebase to a dense 0-based index per line.
    */
  def shotIndexFloorDiv(df: DataFrame, line: String, shot: String, numGuns: Int,
                        out: String = "shot_index"): DataFrame = {
    val w = Window.partitionBy(col(line))
    val divided = floor(col(shot) / numGuns)
    df.withColumn(out, (divided - min(divided).over(w)).cast("long"))
  }
}
