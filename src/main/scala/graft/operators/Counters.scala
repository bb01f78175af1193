package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index strategies that append running counters (the reference's dict-tree
  * counter becomes a one-line window function).
  *
  * G3 `DuplicateHandlingStrategy` (reference `ingestion/segy/
  * index_strategies.py:116-165`, counter `header_analysis.py:202-284`):
  * a 1-based per-group running counter `trace` over all dim fields,
  * disambiguating duplicate index tuples. The counter order is *file order*
  * of the traces, so callers pass an explicit ordinal column list
  * (SURVEY §7.3 — make the ordinal first-class).
  *
  * G4 `NonBinnedStrategy` (`index_strategies.py:168-203`): same counter
  * partitioned by only the *kept* dims; the collapsed dims ride along as
  * ordinary columns.
  *
  * G7 `ComponentSynthesisStrategy` (`index_strategies.py:302-328`): add a
  * constant-1 field for template dims missing from the headers.
  *
  * Scale: `row_number` over `Window.partitionBy(dims)` is a single shuffle on
  * the dim hash — no global sort, no driver state. Skewed dim tuples would
  * funnel into one task; for seismic grids group sizes are bounded by the
  * fold (small), so no salting is needed.
  */
object Counters {

  /** G3: 1-based running counter per dim tuple, ordered by the ordinal cols. */
  def duplicateCounter(df: DataFrame, dims: Seq[String], ordinal: Seq[String],
                       out: String = "trace"): DataFrame = {
    require(dims.nonEmpty && ordinal.nonEmpty, "dims and ordinal must be non-empty")
    val w = Window.partitionBy(dims.map(col): _*).orderBy(ordinal.map(col): _*)
    df.withColumn(out, row_number().over(w).cast("long"))
  }

  /** G4: collapse non-binned dims — counter over the kept dims only. */
  def nonBinnedCounter(df: DataFrame, keptDims: Seq[String], ordinal: Seq[String],
                       out: String = "trace"): DataFrame =
    duplicateCounter(df, keptDims, ordinal, out)

  /** G7: synthesize a constant dimension (e.g. OBN `component` = 1). */
  def synthesizeComponent(df: DataFrame, name: String, value: Int = 1): DataFrame =
    df.withColumn(name, lit(value))
}
