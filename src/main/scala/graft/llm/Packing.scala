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
}
