package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single right row with the
  * greatest `rightTs` ≤ the left row's `leftTs`, per join key (pandas
  * `merge_asof` / DuckDB `ASOF JOIN` semantics, the standard time-series
  * enrichment: price-at-trade, last-config-before-event, most recent
  * purchase before a click).
  *
  * Spark has no native as-of join; the scale-correct composition is the
  * union trick, NOT a per-key loop or an inequality join:
  *
  *  1. union left and right rows tagged by side, right rows packed into one
  *     struct column (null on left rows);
  *  2. one window per join key ordered by (ts, side) carrying
  *     `last(struct, ignoreNulls = true)` — right rows sort BEFORE left
  *     rows at equal ts, so ties match inclusively like `l.ts >= r.ts`;
  *  3. keep left rows, unpack the carried struct; optionally null matches
  *     staler than `toleranceSeconds`.
  *
  * Scale shape: ONE shuffle on the join key (both sides together), then a
  * per-key sort — no cross product, no range-condition nested loop, state
  * bounded by rows per key like any keyed window. A 1000-executor cluster
  * partitions by key; skewed keys shard like any other window partition
  * (salt upstream if one key dominates).
  *
  * Contract: the right side must be unique per (keys, rightTs) — duplicate
  * equal-timestamp rows have no defined winner in ANY as-of engine;
  * [[dedupRight]] canonicalizes with a caller-chosen tiebreak first.
  */
object AsofJoin {

  /** Keep one right row per (keys, ts): the one with the greatest
    * `tiebreak` value — a deterministic canonicalization to meet the
    * uniqueness contract.
    */
  def dedupRight(right: DataFrame, on: Seq[String], tsCol: String,
                 tiebreak: String): DataFrame = {
    val others = right.columns.filterNot(c =>
      on.contains(c) || c == tsCol).toSeq
    right.groupBy((on :+ tsCol).map(col): _*)
      .agg(max_by(struct(others.map(col): _*), col(tiebreak)).as("_mx"))
      .select((on :+ tsCol).map(col) ++
        others.map(c => col(s"_mx.$c").as(c)): _*)
  }

  /** The join. Output = every left column, then `asof_<rightTs>` and
    * `asof_<v>` for each requested right value column (null when no right
    * row precedes — `forward = true`: follows — the left row, or the
    * match is further away than the tolerance). Forward direction flips
    * the carry: FIRST following right row per key (`l.ts <= r.ts`,
    * equal-ts inclusive), the frame running from the current row to the
    * partition end.
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTs: String = "ts", rightTs: String = "ts",
               valueCols: Seq[String] = Seq("value"),
               toleranceSeconds: Option[Long] = None,
               forward: Boolean = false): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    require(valueCols.nonEmpty, "select at least one right value column")
    // same guard RangeJoin.pointInInterval has: a left frame already
    // carrying an internal staging name or a to-be-emitted asof_* output
    // name would produce an ambiguous-column error or silently wrong
    // unpacking from the packed struct
    val internal = Set("_ets", "_side", "_r", "_l", "_m")
    val outputs = (rightTs +: valueCols).map(c => s"asof_$c").toSet
    val collide = left.columns.filter(c => internal(c) || outputs(c))
    require(collide.isEmpty,
      s"left columns collide with as-of join internal/output names: " +
        collide.mkString(", "))
    val rStruct = struct(col(rightTs).as("_rts") +:
      valueCols.map(col): _*)
    // backward: right sorts BEFORE left at equal ts (match inclusive);
    // forward: right sorts AFTER left at equal ts — and the side tag must
    // flip with it so the carry window looks the right way
    val (rSide, lSide) = if (forward) (1, 0) else (0, 1)
    val rPacked = right.select(on.map(col) :+ col(rightTs).as("_ets") :+
      lit(rSide).as("_side") :+ rStruct.as("_r"): _*)
    val rType = rPacked.schema("_r").dataType
    val lPacked = left.select(on.map(col) :+ col(leftTs).as("_ets") :+
      lit(lSide).as("_side") :+ lit(null).cast(rType).as("_r") :+
      struct(left.columns.map(col): _*).as("_l"): _*)
    val rWithNullL = rPacked.withColumn("_l",
      lit(null).cast(lPacked.schema("_l").dataType))
    val base = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_ets"), col("_side"))
    val w =
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry =
      if (forward) first(col("_r"), ignoreNulls = true)
      else last(col("_r"), ignoreNulls = true)
    val carried = lPacked.unionByName(rWithNullL)
      .withColumn("_m", carry.over(w))
      .where(col("_l").isNotNull)
    // exact micros, not cast("long") — that floors to SECONDS and shifts
    // the tolerance boundary for sub-second event times
    val gap =
      if (forward) unix_micros(col("_m._rts")) - unix_micros(col("_ets"))
      else unix_micros(col("_ets")) - unix_micros(col("_m._rts"))
    val bounded = toleranceSeconds match {
      case Some(tol) =>
        carried.withColumn("_m", when(gap <= tol * 1000000L, col("_m")))
      case None => carried
    }
    bounded.select(
      left.columns.toSeq.map(c => col(s"_l.$c").as(c)) ++
        (col("_m._rts").as(s"asof_$rightTs") +:
          valueCols.map(v => col(s"_m.$v").as(s"asof_$v"))): _*)
  }
}
