package graft.streaming

import org.apache.spark.sql.DataFrame
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
}
