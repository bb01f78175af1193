package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous ingestion: the batch pipeline's S2+S3 composed as a
  * Structured Streaming `foreachBatch` sink (SURVEY §2.11 — the reference is
  * batch-only; this is the natural streaming extension).
  *
  * Each micro-batch appends range-clustered rows to the store's data
  * directory; because `foreachBatch` hands over a normal DataFrame, the SAME
  * strategy transforms run per batch — stream and backfill share one code
  * path. Grid invariants that need global state (J2 uniqueness) are a
  * post-load QC here, as any append-capable store requires.
  */
object StreamingIngest {

  /** Start appending the stream into `<path>/data`, clustered by `dims`. */
  def appendToStore(stream: DataFrame, path: String, dims: Seq[String],
                    transform: DataFrame => DataFrame = identity,
                    checkpoint: Option[String] = None): StreamingQuery = {
    val cp = checkpoint.getOrElse(s"$path/_checkpoint")
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val t = transform(batch)
        val clustered =
          if (dims.isEmpty) t
          else t.repartitionByRange(dims.map(col): _*)
                .sortWithinPartitions(dims.map(col): _*)
        clustered.write.mode(SaveMode.Append).parquet(s"$path/data")
      }
      .start()
  }
}
