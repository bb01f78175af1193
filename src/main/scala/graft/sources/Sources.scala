package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ------------------------------------------------- V240 raw trace headers

  /** Fixed raw trace-header width (SEG-Y rev — 240 bytes; ScalarType.V240). */
  val RawHeaderBytes = 240

  /** Raw 240-byte trace-header blob: each field packed as a 4-byte big-endian
    * two's-complement int in spec order, zero-padded to 240 bytes — the
    * `raw_headers` ingest path (`ingestion/segy/raw_headers.py:32-64` keeps
    * the undecoded header block as a V240 variable beside the parsed
    * fields). Native byte pack ([[graft.functions.BeBytesPack]]), no UDF
    * and no hex-string round trip.
    */
  def packRawHeader(fields: Seq[String]): Column = {
    require(fields.size * 4 <= RawHeaderBytes, "too many fields for 240 bytes")
    val packed: Seq[Column] = fields.map(f =>
      graft.functions.BeBytesPack(col(f).cast("bigint"), 4, f, checked = false))
    val pad = lit(Array.fill[Byte](RawHeaderBytes - fields.size * 4)(0))
    concat((packed :+ pad): _*)
  }

  /** Attach the raw header column (default name mirrors the reference's
    * `RAW_HEADERS` variable). */
  def withRawHeaders(df: DataFrame, fields: Seq[String],
                     out: String = "raw_headers"): DataFrame =
    df.withColumn(out, packRawHeader(fields))

  /** Re-parse field `i` (0-based spec position) out of a raw header blob:
    * 4 bytes big-endian → signed 32-bit value as a long. Inverse of
    * [[packRawHeader]] — round-trip asserted in RawHeaderSpec.
    */
  def parseRawHeaderField(raw: Column, i: Int): Column =
    graft.functions.BeIntAt(raw, lit(i * 4).cast("int"), 4).cast("long")
}
