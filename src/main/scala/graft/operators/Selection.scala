package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Labeled selection — the reference's user-facing `sel` query surface (P3).
  *
  * Reference: `dataset.sel(inline=278)`, `sel(time=slice(...))` slice all
  * variables at once (xarray; `docs/tutorials/quickstart.ipynb`). In Spark a
  * labeled selection is a conjunction of pushdown-friendly predicates:
  * equality → partition/row-group pruning, ranges → min/max row-group skips —
  * the same chunk-pruning the reference gets from Zarr indexing.
  */
object Selection {

  sealed trait Sel
  /** `sel(dim = value)` — point selection. */
  final case class Point(value: Any) extends Sel
  /** `sel(dim = slice(lo, hi))` — inclusive range, matching xarray's
    * label-based slicing (both endpoints included). */
  final case class Range(lo: Any, hi: Any) extends Sel
  /** `sel(dim = [v1, v2, ...])` — list selection. */
  final case class Values(vs: Seq[Any]) extends Sel

  def predicate(dim: String, sel: Sel): Column = sel match {
    case Point(v)     => col(dim) === lit(v)
    case Range(lo, hi) => col(dim).between(lit(lo), lit(hi))
    case Values(vs)   => col(dim).isInCollection(vs)
  }

  /** Apply labeled selections; all variables (columns) are sliced at once. */
  def sel(df: DataFrame, sels: Map[String, Sel]): DataFrame =
    sels.foldLeft(df) { case (d, (dim, s)) => d.where(predicate(dim, s)) }
}
