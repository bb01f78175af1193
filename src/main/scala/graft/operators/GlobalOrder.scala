package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField}

/** Global ordered sequencing — the export-order operator (E4).
  *
  * Reference `segy/blocked_io.py:214-303`: the SEG-Y export writes traces in
  * global (dim-major) order via a hierarchical part-file merge. The Spark
  * analog is a range-partitioned global sort plus a contiguous 0-based
  * sequence number.
  *
  * Scale: a naive `row_number() OVER (ORDER BY ...)` collapses all rows into
  * ONE window partition — a single-task bottleneck at 100 TB. Instead we
  * `orderBy` (range-partitioned sort: sampled boundaries, fully parallel)
  * and then assign contiguous ids with the classic two-pass zipWithIndex:
  * pass 1 counts rows per partition (tiny), pass 2 adds the per-partition
  * offset. No data ever funnels through one task.
  */
object GlobalOrder {

  /** Globally sort by `keys` and append a contiguous 0-based `seq` column. */
  def withGlobalSeq(df: DataFrame, keys: Seq[String], out: String = "seq"): DataFrame = {
    val sorted = df.orderBy(keys.map(col): _*)
    val schema = sorted.schema.add(StructField(out, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Globally sort by `keys` and append the EXCLUSIVE global running total
    * of `valueCol` (the prefix sum of all earlier rows; first row gets 0).
    * Same two-pass shape as [[withGlobalSeq]] — a `sum() OVER (ORDER BY …)`
    * window would funnel everything through one task; instead pass 1 sums
    * each partition (one tiny row per partition) and pass 2 adds the
    * per-partition offsets. `valueCol` must be LongType.
    */
  def withRunningTotal(df: DataFrame, keys: Seq[String], valueCol: String,
                       out: String = "running"): DataFrame = {
    val sorted = df.orderBy(keys.map(col): _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"withRunningTotal needs a LongType $valueCol")
    val schema = sorted.schema.add(StructField(out, LongType, nullable = false))
    val rdd0 = sorted.rdd
    val partSums = rdd0.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val rdd = rdd0.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r => val o = acc; acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ o) }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
