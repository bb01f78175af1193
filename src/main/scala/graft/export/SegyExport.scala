package graft.export

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{GlobalOrder, Masking, Projection}

/** The export driver (E1/E3/E5) — the Spark shape of
  * `converters/mdio.py:32-158`:
  * open → rechunk (E1) → header-project (P2) → mask (P4/P5) → bbox (P6) →
  * serialize (E3) → ordered commit (E4).
  *
  * E4's hierarchical part-file tree merge collapses into a range-partitioned
  * global sort + task-ordered committer: Spark's committer renames part
  * files in task order, so a sorted write IS the ordered concat.
  */
object SegyExport {

  /** E1: export rechunk — repartition into ~`targetMb` range partitions on
    * the export order keys (`segy/utilities.py:146-198` targets ~300 MB,
    * fastest-varying axis first).
    */
  def rechunkForExport(df: DataFrame, orderKeys: Seq[String],
                       totalBytes: Long, targetMb: Int = 300): DataFrame = {
    val parts = math.max(1, (totalBytes / (targetMb * 1024L * 1024L)).toInt)
    df.repartitionByRange(parts, orderKeys.map(col): _*)
      .sortWithinPartitions(orderKeys.map(col): _*)
  }

  /** E3: per-trace binary record — headers packed big-endian (4-byte ints in
    * spec order) followed by the serialized sample payload. Pure column
    * expressions over binary concat; a real SEG-Y writer swaps the payload
    * encoding, the plumbing is identical.
    */
  def serializeTraces(df: DataFrame, headerFields: Seq[String],
                      samplesCol: String): DataFrame = {
    // fixed 4-byte big-endian two's complement: mask to 32 bits, left-pad the
    // hex to 8 chars (hex() drops leading zeros)
    val headerBytes: Seq[Column] = headerFields.map(f =>
      call_function("to_binary",
        lpad(hex(col(f).cast("bigint").bitwiseAND(0xFFFFFFFFL)), 8, "0"),
        lit("hex")))
    val payload = col(samplesCol).cast("binary")
    df.withColumn("trace_record", concat((headerBytes :+ payload): _*))
      .withColumn("record_len", octet_length(col("trace_record")).cast("long"))
  }

  /** E5: the masked-export pipeline. Returns the globally ordered, masked,
    * projected trace table with a contiguous `seq` — what the part-file
    * writer consumes.
    */
  def maskedExport(df: DataFrame, mask: Column, dims: Seq[String],
                   headerFields: Seq[String], orderKeys: Seq[String]): DataFrame = {
    val selected = Masking.maskedSelect(df, mask, dims,
      (headerFields ++ orderKeys).distinct)
    val projected = Projection.projectToSpec(selected,
      (orderKeys ++ headerFields.filterNot(orderKeys.contains)).distinct)
    GlobalOrder.withGlobalSeq(projected, orderKeys)
  }
}
