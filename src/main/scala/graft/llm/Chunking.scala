package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking: split each document's token stream into
  * fixed-size, optionally-overlapping windows — the long-document →
  * training-sample shape used when documents exceed the model context
  * (complement of [[Packing]], which packs SHORT docs into windows; this
  * splits LONG docs into samples).
  *
  * Scale shape: a single narrow codegen'd map + explode — no shuffle, no
  * window function, no driver state. Each input row expands to its own
  * chunks independently, so the operator partitions perfectly at any scale;
  * output size is bounded by n_tokens / stride per doc.
  */
object Chunking {

  /** Chunk `docs` into `chunkTokens`-sized windows every `stride` tokens.
    *
    * A doc with n ≤ chunkTokens tokens yields exactly one chunk (possibly
    * short, possibly empty for an empty doc). Otherwise chunk i covers
    * tokens [i·stride, i·stride + chunkTokens) with the last chunk starting
    * at the smallest i·stride such that i·stride + chunkTokens ≥ n (clamped
    * slice — the tail chunk may be shorter). stride < chunkTokens gives
    * overlapping chunks (training-sample overlap); stride = chunkTokens is
    * exact partitioning.
    *
    * Output: (idCol, chunk_idx, chunk_start, n_chunk_tokens, chunk_text).
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int, stride: Int,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0, s"stride must be positive, got $stride")
    val toked = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
    // last chunk index: 0 when the doc fits in one chunk, else the integer
    // ceil of (n − chunkTokens) / stride — pure integer arithmetic.
    val lastIdx = when(col("_n") <= chunkTokens, lit(0))
      .otherwise(expr(s"(_n - $chunkTokens + $stride - 1) DIV $stride"))
    toked
      .withColumn("chunk_idx", explode(sequence(lit(0), lastIdx.cast("int"))))
      .withColumn("chunk_start", col("chunk_idx") * stride)
      .withColumn("_slice",
        slice(col("_toks"), col("chunk_start") + 1, lit(chunkTokens)))
      .select(col(idCol),
        col("chunk_idx"),
        col("chunk_start"),
        size(col("_slice")).as("n_chunk_tokens"),
        array_join(col("_slice"), " ").as("chunk_text"))
  }
}
