package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Masked-export filters: mask conjunction, empty guard, bounding-box trim.
  *
  * P4 live-trace filter (reference `segy/_workers.py:142-146`): in Spark,
  * dead traces are simply absent rows, so the filter is `where(mask)`.
  * P5 selection-mask conjunction + empty guard (`converters/mdio.py:100-112`).
  * P6 bounding-box trim (`converters/mdio.py:114-125`): per-dim min/max of
  * the masked rows → BETWEEN predicates, which Catalyst pushes into the scan
  * (partition/row-group pruning — exactly what the reference's `isel` slice
  * achieves against Zarr chunks).
  */
object Masking {

  final class EmptySelectionException(msg: String) extends RuntimeException(msg)

  /** P5: conjoin masks and fail on an empty selection (reference raises too). */
  def applyMasks(df: DataFrame, masks: Seq[Column]): DataFrame = {
    val out = masks.foldLeft(df)((d, m) => d.where(m))
    if (out.isEmpty) throw new EmptySelectionException("selection mask removed every trace")
    out
  }

  /** P6: one-row bounding box (min/max per dim) of the masked selection. */
  def boundingBox(df: DataFrame, mask: Column, dims: Seq[String]): DataFrame = {
    val masked = df.where(mask)
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"${d}_lo"), max(col(d)).as(s"${d}_hi"))) :+
      count(lit(1)).as("n_live")
    masked.agg(aggs.head, aggs.tail: _*)
  }

  /** P4–P6 composed: masked rows, trimmed to the bounding box of the mask.
    * The BETWEEN trim is semantically redundant after the mask filter but is
    * applied anyway (as the reference does) so the scan prunes dead border
    * chunks; predicates reach the Parquet reader via pushdown.
    */
  def maskedSelect(df: DataFrame, mask: Column, dims: Seq[String],
                   projection: Seq[String]): DataFrame = {
    val bbox = boundingBox(df, mask, dims).first()
    val trims: Seq[Column] = dims.map { d =>
      col(d).between(lit(bbox.get(bbox.fieldIndex(s"${d}_lo"))),
                     lit(bbox.get(bbox.fieldIndex(s"${d}_hi"))))
    }
    (trims :+ mask).foldLeft(df)((d, m) => d.where(m)).select(projection.map(col): _*)
  }
}
