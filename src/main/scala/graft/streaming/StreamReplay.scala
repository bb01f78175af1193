package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Deployment-shaped fixture replay: stage a batch table as TIME-ORDERED
  * slice files so a `maxFilesPerTrigger=1` file stream delivers rows in
  * event-time order across micro-batches.
  *
  * Why this exists: the single-file staging the streaming queries default
  * to delivers the WHOLE history in one micro-batch, so the watermark
  * never advances mid-replay and every watermark-bounded operator holds
  * its entire output in state at once — the round-14 sweep measured
  * q_stream_sessions at 9.5 M state rows / 3.3 GB at sf10 for exactly
  * this reason. A real deployment's input arrives roughly in time order;
  * the watermark trails it and state holds only the horizon. This helper
  * reproduces that shape: slice i covers a strictly earlier ts range than
  * slice i+1, so no event is ever late (each batch's min ts exceeds the
  * previous batch's max, which the watermark lags by the full delay) and
  * the streamed result is bit-identical to the one-batch replay — only
  * the state PEAK changes, from |history| to |slice| + |horizon|.
  *
  * Slicing is by equal TIME ranges (monotone in ts, an exact partition of
  * the value range, ~equal rows on near-uniform data) — never a global
  * sort: one count/min/max pass, one hash-repartition write, then
  * per-slice renames. File order is forced two ways: ascending names AND
  * explicitly set ascending mtimes (the file source processes oldest
  * mtime first; same-job writes would otherwise tie).
  */
object StreamReplay {

  /** Stage `df` under `destDir` as ~`rowsPerSlice`-row time-ordered slice
    * files. Returns the number of slices written. `tsCol` may be a native
    * timestamp or epoch-long column (the raw TIMESTAMP(NANOS)-as-long
    * fixture shape stays monotone untouched).
    */
  def stageTimeSliced(df: DataFrame, destDir: String, tsCol: String = "ts",
                      rowsPerSlice: Long = 100000L): Int = {
    require(rowsPerSlice > 0, s"rowsPerSlice must be positive, got $rowsPerSlice")
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val tsNum = df.schema(tsCol).dataType match {
      case LongType => col(tsCol)
      case _ => unix_micros(col(tsCol).cast(TimestampType))
    }
    val head = df.agg(count(lit(1)), min(tsNum), max(tsNum)).collect().head
    val n = head.getLong(0)
    require(n > 0, "stageTimeSliced: no rows to stage")
    val (lo, hi) = (head.getLong(1), head.getLong(2))
    val nSlices = math.min(math.max(1L, (n + rowsPerSlice - 1) / rowsPerSlice),
      100000L).toInt
    val span = hi - lo + 1
    // routing needs exactly ONE property: MONOTONE in ts (slices must not
    // interleave in time; equal ts always routes together). long→double
    // rounding and IEEE ops by positive constants are all monotone, so
    // this holds at any magnitude — while long column arithmetic would
    // silently wrap on (span × nSlices) overflow and break it. Boundary
    // wobble from double rounding only moves a hair of rows one slice
    // over; slice sizes are approximate by design.
    val idx = least(lit(nSlices - 1),
      floor((tsNum - lo).cast("double") * nSlices / span)).cast("int")

    val tmp = graft.core.TempDirs.scratch("timeslice_stage")
    // repartition BY the slice id: each slice's rows land in exactly one
    // task, so each _slice=i dir holds exactly one part file
    df.withColumn("_slice", idx).repartition(col("_slice"))
      .write.partitionBy("_slice").mode("overwrite").parquet(tmp)
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(hconf)
    fs.mkdirs(dest): Unit
    val base = System.currentTimeMillis()
    (0 until nSlices).foreach { i =>
      val sliceDir = new Path(tmp, s"_slice=$i")
      if (fs.exists(sliceDir)) { // empty slices write nothing: skip
        val parts = fs.listStatus(sliceDir).map(_.getPath)
          .filter(_.getName.startsWith("part-"))
        require(parts.length == 1,
          s"slice $i has ${parts.length} part files — repartition by slice id broke")
        val out = new Path(dest, f"slice_$i%06d.parquet")
        require(fs.rename(parts.head, out), s"rename to $out failed")
        // ascending mtimes pin the file source's processing order even
        // though every slice came from the same write job
        fs.setTimes(out, base + i, -1)
      }
    }
    fs.delete(new Path(tmp), true): Unit
    nSlices
  }
}
