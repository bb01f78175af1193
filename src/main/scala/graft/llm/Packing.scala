package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: map each document to the fixed-size context windows it
  * occupies in the training stream — the concat-and-chunk shape LLM
  * pretraining actually uses (all documents concatenated in a deterministic
  * order, the token stream split every `ctxTokens`). The output is the
  * pack manifest a data loader shards by `window_first`.
  *
  * Scale shape: token counts are a narrow codegen'd map; the global token
  * offset is [[graft.operators.GlobalOrder.withRunningTotal]] — a
  * range-partitioned sort + two-pass prefix sum, never a single-partition
  * window — and everything after the offset is again a narrow map. One
  * sort of (id, n_tokens) rows total, nothing carries text.
  */
object Packing {

  /** Pack `docs` into `ctxTokens`-sized windows in ascending `idCol` order.
    * Emits (idCol, n_tokens, start_offset, window_first, window_last,
    * n_windows): the doc's tokens occupy stream offsets
    * [start_offset, start_offset + n_tokens), so it lands in windows
    * floor(start_offset/ctx) … floor((start_offset + n_tokens − 1)/ctx).
    * An empty doc occupies no tokens and reports its boundary window with
    * n_windows = 1 (keeps the manifest total-row-preserving).
    */
  def packSequences(docs: DataFrame, ctxTokens: Int,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(ctxTokens > 0, s"ctxTokens must be positive, got $ctxTokens")
    val counted = docs.select(col(idCol),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    graft.operators.GlobalOrder
      .withRunningTotal(counted, Seq(idCol), "n_tokens", "start_offset")
      .withColumn("window_first", expr(s"start_offset DIV $ctxTokens"))
      .withColumn("window_last",
        when(col("n_tokens") > 0,
          expr(s"(start_offset + n_tokens - 1) DIV $ctxTokens"))
          .otherwise(col("window_first")))
      .withColumn("n_windows", col("window_last") - col("window_first") + 1)
  }

  /** Deterministic global shuffle + shard assignment for the training
    * stream: order by a keyed md5-60 of the id (`"shuf:" || id` — a
    * reproducible pseudo-random permutation), number the permuted stream
    * with the two-pass global sequence, and deal rows round-robin into
    * `nShards` shards (shard sizes differ by at most one row).
    *
    * Pretraining needs corpus order decorrelated from ingest order, and the
    * permutation must survive task retries and engine changes — `rand()`
    * does neither; the keyed hash does both. Output: (idCol, shuffle_key,
    * seq, shard); a data loader reads its shard's rows in seq order.
    *
    * Scale shape: one range-partitioned sort of (id, hash) rows — the same
    * two-pass zipWithIndex as [[packSequences]]; nothing carries text.
    */
  def shuffleShards(docs: DataFrame, nShards: Int,
                    idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val keyed = docs.select(col(idCol),
      graft.functions.CrossHashExprs.md5h60(
        concat(lit("shuf:"), col(idCol).cast("string"))).as("shuffle_key"))
    graft.operators.GlobalOrder
      .withGlobalSeq(keyed, Seq("shuffle_key", idCol), "seq")
      .withColumn("shard", col("seq") % nShards)
  }

  /** Length-bucketed batch manifest — the INFERENCE/eval-side dual of
    * [[packSequences]]: transformer batches pad every sequence to the
    * batch max, so batching docs of similar length minimizes pad waste
    * ("bucketed batching"). Docs bucket by `ceil(n_tokens / bucketTokens)`
    * (empty docs → bucket 0), order within the bucket by (n_tokens, id) —
    * deterministic — and group into `batchSize`-row batches. Emits (idCol,
    * n_tokens, bucket, batch_idx, pad_to): a loader runs batch (bucket,
    * batch_idx) padded to its recorded max.
    *
    * Scale shape: one shuffle on bucket + a per-bucket window (buckets are
    * many and balanced for real corpora — the skewed-bucket case is the
    * middle of the length distribution, still thousands of batches per
    * bucket, shardable downstream by batch_idx).
    */
  def lengthBucketBatches(docs: DataFrame, bucketTokens: Int, batchSize: Int,
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    require(bucketTokens > 0 && batchSize > 0,
      s"bucketTokens and batchSize must be positive")
    val counted = docs.select(col(idCol),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("bucket",
        expr(s"(n_tokens + ${bucketTokens - 1}) DIV $bucketTokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("n_tokens"), col(idCol))
    counted
      .withColumn("batch_idx",
        floor((row_number().over(w) - 1) / lit(batchSize)).cast("long"))
      .withColumn("pad_to",
        max(col("n_tokens")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("bucket"), col("batch_idx"))))
  }
}
