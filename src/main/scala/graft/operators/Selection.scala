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
    case Point(v)            => col(dim) === lit(v)
    case Range(lo, hi)       => col(dim).between(lit(lo), lit(hi))
    case Values(vs) if vs.isEmpty => lit(false)
    case Values(vs)          => col(dim).isInCollection(vs)
  }

  /** Apply labeled selections; all variables (columns) are sliced at once. */
  def sel(df: DataFrame, sels: Map[String, Sel]): DataFrame =
    sels.foldLeft(df) { case (d, (dim, s)) => d.where(predicate(dim, s)) }

  // ------------------------------------------------- positional (isel)

  /** POSITIONAL selection — xarray's `isel` (P3's other half): integer
    * positions along the dim's sorted coordinate order. Python/xarray
    * conventions throughout: slices are start-inclusive/stop-EXCLUSIVE and
    * clamp silently; points and value lists raise on out-of-bounds;
    * negative indices count from the end.
    */
  sealed trait ISel
  /** `isel(dim = i)` — single position. */
  final case class IPoint(i: Long) extends ISel
  /** `isel(dim = slice(start, stop))` — stop exclusive, clamping. */
  final case class ISlice(start: Long, stop: Long) extends ISel
  /** `isel(dim = [i1, i2, ...])` — position list. */
  final case class IValues(is: Seq[Long]) extends ISel

  /** Resolve a positional selection against the dim's coordinate table
    * (sorted distinct `dim_value`, the store's `dims/<dim>` sidecar) into a
    * LABEL selection, which then prunes like any `sel`. Positions attach
    * via the two-pass prefix-sum sequence (no single-partition window), and
    * only parameter-many labels ever reach the driver: a point collects
    * one row, a list collects its positions, and a slice reduces to its
    * min/max label — contiguous positions on a sorted table ARE a label
    * range, so the predicate stays `between` (row-group prunable).
    *
    * Reference: `api/io.py` datasets expose sel/isel; positional lookups
    * there are xarray index arithmetic over the coordinate arrays.
    */
  def resolvePositional(dimTable: DataFrame, isel: ISel): Sel = {
    val seqd = GlobalOrder.withGlobalSeq(
      dimTable.select(col("dim_value")), Seq("dim_value"))
    // size is only needed to resolve negative indices — skip the count
    // otherwise
    def size(): Long = dimTable.count()
    def norm(i: Long): Long = if (i < 0) size() + i else i
    isel match {
      case IPoint(i0) =>
        val i = norm(i0)
        val hit = seqd.where(col("seq") === i).select("dim_value").collect()
        if (hit.isEmpty) throw new IndexOutOfBoundsException(
          s"isel position $i0 out of bounds for dim of size ${size()}")
        Point(hit.head.get(0))
      case ISlice(s0, e0) =>
        val (s, e) = (norm(s0), norm(e0))
        if (e <= s) Values(Nil)
        else {
          val bounds = seqd.where(col("seq") >= s && col("seq") < e)
            .agg(min(col("dim_value")), max(col("dim_value"))).collect().head
          if (bounds.isNullAt(0)) Values(Nil) // start beyond the end: empty
          else Range(bounds.get(0), bounds.get(1))
        }
      case IValues(is0) =>
        if (is0.isEmpty) Values(Nil)
        else {
          val is = is0.map(norm)
          val hits = seqd.where(col("seq").isInCollection(is))
            .select("dim_value").collect().map(_.get(0))
          if (hits.length != is.distinct.length)
            throw new IndexOutOfBoundsException(
              s"isel positions ${is0.mkString(",")} out of bounds for dim of " +
                s"size ${size()}")
          Values(hits.toSeq)
        }
    }
  }
}
