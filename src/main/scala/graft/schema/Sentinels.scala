package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-value sentinels ↔ SQL NULL.
  *
  * The reference marks dead cells with per-type sentinels — NaN for floats,
  * max-int for (u)ints (`constants.py:43-67`). The Spark-native encoding is
  * NULL (absent rows ARE the dead traces; SURVEY §1.2), but export back to
  * the reference's formats must re-materialize the exact sentinel, so the
  * mapping is kept as a value table here.
  */
object Sentinels {
  import ScalarType._

  /** The reference's fill value per scalar type, as a Spark literal-able
    * value (unsigned types use their widened signed representation). */
  val fillValue: Map[ScalarType.Value, Any] = Map(
    Float16 -> Float.NaN, Float32 -> Float.NaN, Float64 -> Double.NaN,
    UInt8 -> 255.toShort,          // widened: uint8 → ShortType
    UInt16 -> 65535,               // uint16 → IntegerType
    UInt32 -> 4294967295L,         // uint32 → LongType
    UInt64 -> BigDecimal("18446744073709551615"), // uint64 → Decimal(20,0)
    Int8 -> Byte.MaxValue, Int16 -> Short.MaxValue,
    Int32 -> Int.MaxValue, Int64 -> Long.MaxValue,
  )

  /** Import direction: sentinel → NULL (NaN handled for float types). */
  def toNull(c: Column, t: ScalarType.Value): Column = t match {
    case Float16 | Float32 | Float64 => when(isnan(c), lit(null)).otherwise(c)
    case _ => fillValue.get(t) match {
      case Some(s) => when(c === lit(s), lit(null)).otherwise(c)
      case None => c
    }
  }

  /** Export direction: NULL → the reference's sentinel. */
  def fromNull(c: Column, t: ScalarType.Value): Column =
    fillValue.get(t) match {
      case Some(s) => coalesce(c, lit(s))
      case None => c
    }

  /** Apply in bulk over (column → declared type). */
  def nullifySentinels(df: DataFrame, types: Map[String, ScalarType.Value]): DataFrame =
    types.foldLeft(df) { case (d, (name, t)) =>
      if (d.columns.contains(name)) d.withColumn(name, toNull(col(name), t)) else d
    }

  def materializeSentinels(df: DataFrame, types: Map[String, ScalarType.Value]): DataFrame =
    types.foldLeft(df) { case (d, (name, t)) =>
      if (d.columns.contains(name)) d.withColumn(name, fromNull(col(name), t)) else d
    }
}
