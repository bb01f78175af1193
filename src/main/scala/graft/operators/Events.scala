package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series operators over the `events` stream table — the batch analog of
  * the Structured Streaming path (readStream → window agg → writeStream uses
  * the identical expressions; see graft.streaming).
  *
  * The reference has no streaming surface (SURVEY §2.11), so these are part
  * of the training-data-pipeline extensions: tumbling-window aggregation and
  * gap-based sessionization, both single-shuffle window/agg plans.
  */
object Events {

  /** Tumbling 1-hour window aggregate per event type. Sums accumulate in
    * DECIMAL for cross-engine determinism (values are exact 2-decimal).
    */
  def hourlyAgg(df: DataFrame): DataFrame =
    df.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
      )

  /** Gap-based sessionization: a new session starts when a user's gap since
    * the previous event exceeds `gapMinutes`. One shuffle on user_id; the
    * cumulative-sum window is per-user (bounded partitions, no global sort).
    */
  def sessionize(df: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    val isNew = when(prevTs.isNull ||
      col("ts").cast("long") - prevTs.cast("long") > gapMinutes * 60L, 1L).otherwise(0L)
    df.withColumn("session_id", sum(isNew).over(byUser))
      .select(col("event_id"), col("user_id"), col("ts"), col("session_id"))
  }
}
