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

  /** Semi-structured extraction: typed stats over a JSON property column —
    * the metadata-sidecar shape every event/telemetry pipeline carries.
    * `get_json_object` is the per-row path extraction (no schema pass, no
    * UDF); a missing or non-integer key becomes NULL and drops out of the
    * aggregates per SQL semantics, with `n_with_key` counting the parses
    * that succeeded. Values are exact integers, so every column
    * hash-matches the SQL oracle.
    */
  def propsStats(df: DataFrame, key: String = "k"): DataFrame = {
    val v = get_json_object(col("props"), s"$$.$key").cast("long")
    df.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(v).as("n_with_key"),
        sum(v).as("sum_v"),
        min(v).as("min_v"),
        max(v).as("max_v"),
      )
  }

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

  /** Ordered funnel: how many users complete step 1 → step 2 → … in STRICT
    * time order (each step strictly after the previous completion — the
    * standard product-analytics funnel). Per user the earliest completion
    * chain greedily advances: t₁ = min ts of step 1, tᵢ = min ts of step i
    * after tᵢ₋₁ (greedy-earliest is optimal here: any later choice of tᵢ₋₁
    * only shrinks the candidate set for tᵢ). Output: one row per step with
    * the user count that reached it — shaped like every funnel dashboard.
    *
    * Scale: one shuffle on user_id; per user the steps fold over a sorted
    * (ts, type) list — no joins, no cross products, state O(steps).
    */
  def funnel(df: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val sess = df.sparkSession
    import sess.implicits._
    // per user: the sorted (ts_micros, step_index) event list, folded
    // greedily into the reached-step count
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(acc)
      }
    val perUser = df
      .where(stepIdx >= 0)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(
        unix_micros(col("ts")).as("t"), stepIdx.as("i")))).as("evs"))
      .select(
        aggregate(col("evs"),
          struct(lit(0).as("reached"), lit(Long.MinValue).as("last_t")),
          (st, e) =>
            when(e.getField("i") === st.getField("reached") &&
                 (st.getField("reached") === 0 ||
                  e.getField("t") > st.getField("last_t")),
              struct((st.getField("reached") + 1).as("reached"),
                e.getField("t").as("last_t")))
              .otherwise(st)
        ).getField("reached").as("reached"))
    val counts = perUser.groupBy(col("reached"))
      .agg(count(lit(1)).as("n_users"))
    // step i is reached by every user whose `reached` > i: suffix-sum
    val stepsDf = steps.zipWithIndex
      .map { case (s, i) => (i.toLong + 1, s) }.toDF("step", "event_type")
    stepsDf.join(counts, counts("reached") >= stepsDf("step"), "left")
      .groupBy(col("step"), col("event_type"))
      .agg(coalesce(sum(col("n_users")), lit(0L)).cast("long").as("n_users"))
  }

  /** Time-to-convert for funnel COMPLETERS: per user completing every
    * step, the micros between the chain's first and last step (the same
    * greedy-earliest chain as [[funnel]]); aggregated to (n_completers,
    * total and mean duration). Integer micros summed exactly; the mean is
    * one final division.
    */
  def funnelLatency(df: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(acc)
      }
    val st0 = struct(lit(0).as("reached"), lit(Long.MinValue).as("last_t"),
      lit(0L).as("first_t"))
    val folded = df
      .where(stepIdx >= 0)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(
        unix_micros(col("ts")).as("t"), stepIdx.as("i")))).as("evs"))
      .select(
        aggregate(col("evs"), st0,
          (st, e) =>
            when(e.getField("i") === st.getField("reached") &&
                 (st.getField("reached") === 0 ||
                  e.getField("t") > st.getField("last_t")),
              struct((st.getField("reached") + 1).as("reached"),
                e.getField("t").as("last_t"),
                when(st.getField("reached") === 0, e.getField("t"))
                  .otherwise(st.getField("first_t")).as("first_t")))
              .otherwise(st)
        ).as("f"))
      .where(col("f.reached") === steps.size)
      .select((col("f.last_t") - col("f.first_t")).as("dur_us"))
    folded.agg(count(lit(1)).cast("long").as("n_completers"),
      sum(col("dur_us")).cast("long").as("total_us"))
      .select(col("n_completers"), col("total_us"),
        (col("total_us").cast("double") / col("n_completers").cast("double"))
          .as("mean_us"))
  }

  /** Cohort retention: users grouped by their FIRST-seen day (the cohort),
    * counted again for each later day they return — the retention matrix
    * (cohort_day, day_offset, n_users). Two grouped aggregations and one
    * broadcast-joinable first-seen table; no windows over the full corpus.
    */
  def cohortRetention(df: DataFrame, maxOffsetDays: Int = 7): DataFrame = {
    val firstSeen = df.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    df.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .join(firstSeen, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .where(col("day_offset").between(0, maxOffsetDays))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
  }
}
