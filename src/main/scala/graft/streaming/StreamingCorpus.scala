package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.CorpusPrep

/** Continuous corpus preparation: the one-pass sketch computation of
  * [[graft.llm.CorpusPrep]] applied to a document STREAM — every sketch
  * column (fingerprint, minhash signature + digest, simhash, quality, token
  * budgets) is a deterministic narrow map, so the same kernels run
  * unchanged inside a Structured Streaming plan; arriving documents land in
  * the prepared corpus already deduplicable/searchable.
  */
object StreamingCorpus {

  /** Sketch columns on a streaming documents frame (same schema as the
    * batch [[CorpusPrep.withSketches]] — asserted in StreamingCorpusSpec).
    */
  def withSketchesStream(stream: DataFrame, textCol: String = "text",
                         n: Int = 3, k: Int = 32): DataFrame =
    CorpusPrep.withSketches(stream, textCol, n, k)

  /** Append the prepared stream to a corpus directory. */
  def appendPrepared(stream: DataFrame, path: String,
                     checkpoint: Option[String] = None): StreamingQuery =
    withSketchesStream(stream).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint.getOrElse(s"$path/_checkpoint"))
      .format("parquet")
      .option("path", path)
      .start()

  /** In-stream exact dedup: arriving documents are keyed by content
    * fingerprint (md5 of the text — the same key as the batch
    * [[graft.llm.Dedup.exactDupGroups]]) and only the FIRST arrival of each
    * fingerprint survives. The drop is enforced by the streaming state store
    * ACROSS micro-batches and across restarts (the seen-fingerprint state
    * rides the checkpoint), so a duplicate arriving hours later is still
    * dropped. Survivor semantics are arrival-order (streaming-natural),
    * where the batch dedup keeps min id.
    *
    * With `watermark = Some((tsCol, delay))` the state is BOUNDED:
    * `dropDuplicatesWithinWatermark` evicts fingerprints older than the
    * watermark, trading unbounded memory for "duplicates beyond `delay`
    * survive" — at 100 TB/stream-forever scale that bound is mandatory, and
    * the batch-side exact dedup is the compaction story at rest.
    */
  def dedupedStream(stream: DataFrame, textCol: String = "text",
                    watermark: Option[(String, String)] = None): DataFrame = {
    val withFp = stream.withColumn("_dedup_fp", md5(col(textCol)))
    val deduped = watermark match {
      case Some((tsCol, delay)) =>
        withFp.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("_dedup_fp")
      case None => withFp.dropDuplicates("_dedup_fp")
    }
    deduped.drop("_dedup_fp")
  }

  /** [[appendPrepared]] composed with [[dedupedStream]]: arriving documents
    * land in the prepared corpus already exact-deduped. */
  def appendPreparedDeduped(stream: DataFrame, path: String,
                            textCol: String = "text",
                            checkpoint: Option[String] = None,
                            watermark: Option[(String, String)] = None): StreamingQuery =
    appendPrepared(dedupedStream(stream, textCol, watermark), path, checkpoint)
}
