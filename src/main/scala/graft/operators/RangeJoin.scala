package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — pair every left POINT (ts) with the right
  * INTERVALS ([start, end], inclusive) that contain it, optionally under
  * equality keys (per user, per symbol, ...).
  *
  * Spark plans a raw `l.ts BETWEEN r.start AND r.end` predicate as
  * BroadcastNestedLoopJoin (or a full cartesian when neither side fits a
  * broadcast) — O(|L|·|R|) comparisons, the classic range-join scale trap.
  * The bucketed composition keeps it an EQUI-join:
  *
  *  1. pick a bucket width ≥ the maximum interval duration. The contract
  *     is VALIDATED, not trusted: one aggregate over the interval table
  *     (the small side of a real range join) fails loudly before any pair
  *     could go missing;
  *  2. width ≥ duration means an interval touches at most two buckets —
  *     it registers in both (one row when start and end share a bucket);
  *     each point probes exactly its own bucket, so every containing
  *     interval is seen and each (point, interval) pair meets exactly
  *     ONCE — no dedup pass;
  *  3. hash-join on (keys, bucket) — shuffle sized by data, not pairs —
  *     then the exact BETWEEN filter keeps true containments.
  *
  * The trade: buckets much wider than typical intervals inflate candidate
  * lists; size the width near the real p100 duration.
  */
object RangeJoin {

  /** `left` carries `tsCol`; `right` carries `startCol`/`endCol`. Output =
    * matched pairs: all left columns + `startCol`/`endCol` + requested
    * right columns (inner join — a point in no interval drops; count per
    * point downstream for the outer shape). `startCol`/`endCol`/
    * `rightCols` must not collide with left column names.
    */
  def pointInInterval(left: DataFrame, right: DataFrame, on: Seq[String],
                      tsCol: String, startCol: String, endCol: String,
                      bucketSeconds: Long,
                      rightCols: Seq[String]): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(rightCols.nonEmpty, "select at least one right column")
    val collide = (Seq(startCol, endCol) ++ rightCols)
      .filter(left.columns.filterNot(on.contains).contains)
    require(collide.isEmpty,
      s"right columns ${collide.mkString(",")} collide with left schema")
    // validated contract (one aggregate over the interval side): a lying
    // bucket width would silently drop pairs — fail here instead
    val durRow = right.agg(
      max(col(endCol).cast("long") - col(startCol).cast("long")).as("mx"),
      min(col(endCol).cast("long") - col(startCol).cast("long")).as("mn"))
      .collect().head
    if (!durRow.isNullAt(0)) {
      require(durRow.getAs[Long]("mn") >= 0, "interval end precedes start")
      require(durRow.getAs[Long]("mx") <= bucketSeconds,
        s"longest interval (${durRow.getAs[Long]("mx")} s) exceeds the " +
          s"bucket width ($bucketSeconds s) — raise bucketSeconds")
    }
    val r = right
      .withColumn("_bkt", explode(array_distinct(array(
        floor(col(startCol).cast("long") / bucketSeconds),
        floor(col(endCol).cast("long") / bucketSeconds)))))
      .select((on.map(col) :+ col("_bkt")) ++
        Seq(col(startCol).as("_start"), col(endCol).as("_end")) ++
        rightCols.map(col): _*)
    left
      .withColumn("_bkt", floor(col(tsCol).cast("long") / bucketSeconds))
      .join(r, on :+ "_bkt")
      .where(col(tsCol).between(col("_start"), col("_end")))
      .drop("_bkt")
      .withColumnRenamed("_start", startCol)
      .withColumnRenamed("_end", endCol)
  }
}
