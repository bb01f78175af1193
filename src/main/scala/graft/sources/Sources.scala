package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-side scans: file info (S1), parallel header scan (S2), IBM32
  * promotion (P7).
  *
  * S1 (`segy/file.py:152-186`) reads file metadata + trace count before any
  * bulk work; here that is a metadata/count query over the fixture table.
  * S2 (`segy/parsers.py:23-76`) fans trace ranges to a process pool; Spark's
  * partitioned Parquet scan with column pruning IS that fan-out —
  * `headerScan` just declares the projection and lets Catalyst prune.
  */
object Sources {

  /** S1: one-row file-info summary — trace count, field count, file count. */
  def fileInfo(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    val nFields = df.columns.length
    df.agg(count(lit(1)).as("n_traces"))
      .withColumn("n_fields", lit(nFields))
      .withColumn("table_name", lit(table))
  }

  /** S2: projected header scan — reads ONLY `fields` (Catalyst column
    * pruning reaches the Parquet reader; `.explain` shows the pruned
    * ReadSchema). Block size ≈ `spark.sql.files.maxPartitionBytes`.
    */
  def headerScan(spark: SparkSession, sfDir: String, table: String,
                 fields: Seq[String]): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet").select(fields.map(col): _*)

  /** P7: promote IBM-float32-declared header fields to FloatType so decoded
    * values are neither truncated nor wrapped (`segy/utilities.py:28-65`).
    */
  def promoteIbm32(df: DataFrame, ibmFields: Seq[String]): DataFrame =
    ibmFields.filter(df.columns.contains)
      .foldLeft(df)((d, f) => d.withColumn(f, col(f).cast("float")))
}
