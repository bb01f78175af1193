package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface for the events pipeline.
  *
  * The reference has no streaming semantics (SURVEY §2.11) — this is part of
  * the training-data-pipeline extensions. The batch operators in
  * `graft.operators.Events` and these streaming transforms share the same
  * expressions; `readStream` vs `read` is the only difference, so a batch
  * backfill and the live stream produce identical rows.
  */
object StreamingEvents {

  /** Tumbling 1-hour windowed aggregation with a watermark for state expiry.
    * At scale: state is bounded by (#windows in watermark horizon × #types);
    * late events beyond 2 hours are dropped deterministically.
    */
  def hourlyAggStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
      )
      .select(col("window.start").as("hour"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Session windows per user: native session_window with the gap duration —
    * state-backed, watermark-expired; the streaming analog of
    * `Events.sessionize`.
    */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        // decimal accumulate: order-independent, so the merged-session sum
        // is deterministic (and oracle-matchable) regardless of state order
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"), col("sum_value"))
}
