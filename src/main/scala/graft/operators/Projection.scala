package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Header-field projection (P1) and spec-order projection (P2).
  *
  * P1 (reference `ingestion/segy/reader.py:47-57`, `ingestion/schema/
  * models.py:55-59`): the minimal header subset to read = the schema's
  * required fields ∩ the spec's available fields, plus the coordinate scalar
  * when any coordinate is scaled. Pure set arithmetic on field names.
  *
  * P2 (`segy/utilities.py:68-113`): reorder/subset stored columns to the
  * target spec's field order — in Spark the order of `select` *is* the field
  * order, and Catalyst column pruning pushes the subset into the scan
  * (`ReadSchema` shows only the projected columns).
  */
object Projection {

  /** P1: required-field computation (schema ∩ spec, + scalar if scaled). */
  def requiredFields(schemaRequired: Set[String], specFields: Set[String],
                     hasScaledCoords: Boolean,
                     scalarField: String = "coordinate_scalar"): Set[String] = {
    val base = schemaRequired intersect specFields
    if (hasScaledCoords && specFields.contains(scalarField)) base + scalarField
    else base
  }

  /** P2: project to the spec's exact field order (subset + reorder). */
  def projectToSpec(df: DataFrame, specOrder: Seq[String]): DataFrame = {
    val missing = specOrder.filterNot(df.columns.contains)
    require(missing.isEmpty, s"spec fields missing from input: ${missing.mkString(", ")}")
    df.select(specOrder.map(col): _*)
  }
}
