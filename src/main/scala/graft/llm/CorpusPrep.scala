package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CrossHashExprs

/** Corpus preparation: compute EVERY sketch/score column the downstream
  * pipeline needs — exact-dup fingerprint, minhash signature, simhash,
  * quality score, token budgets — in ONE narrow map over the text, and
  * materialize them beside the corpus.
  *
  * This is the 100-TB-critical shape: the text is scanned once at ingest;
  * every later dedup/filter/search query reads precomputed columns
  * (`(id, 32 longs)`-sized, not text-sized) — the LLM-side analog of the
  * reference's materialize-once access patterns
  * (`optimize/access_pattern.py:26-118`).
  */
object CorpusPrep {

  /** 60-bit digest of a minhash signature (md5-60 of the comma-joined
    * decimal rendering — the banding encoding, over the full signature).
    */
  def sigDigest(sig: Column): Column =
    CrossHashExprs.md5h60(concat_ws(",", sig.cast("array<string>")))

  /** All sketch columns in one pass: fp (exact-dup key), sig + sig_h
    * (near-dup LSH), simhash, quality/keep, token budgets.
    */
  def withSketches(df: DataFrame, textCol: String = "text",
                   n: Int = 3, k: Int = 32): DataFrame = {
    val toksLower = TextAnalysis.tokens(lower(col(textCol)))
    val scored = TextAnalysis.tokenCounts(
      TextAnalysis.qualityScore(df, textCol), textCol)
    scored
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("sig",
        CrossHashExprs.minhashSig(CrossHashExprs.shingleHashes(toksLower, n), k))
      .withColumn("sig_h", sigDigest(col("sig")))
      .withColumn("simhash",
        CrossHashExprs.simhash(CrossHashExprs.md5h60Array(array_distinct(toksLower)), 60))
  }

  /** The sketch columns [[withSketches]] adds (score intermediates dropped). */
  val sketchColumns: Seq[String] = Seq("fp", "sig", "sig_h", "simhash",
    "quality", "keep", "n_ws_tokens", "n_bpeish")

  /** Materialize the prepared corpus — every source column (id, text,
    * strata/metadata) plus the sketches — to `path` and return the
    * lineage-free reader: what every downstream query consumes.
    */
  def prepare(df: DataFrame, path: String, textCol: String = "text",
              n: Int = 3, k: Int = 32): DataFrame = {
    withSketches(df, textCol, n, k)
      .select((df.columns.toSeq ++ sketchColumns).map(col): _*)
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Snapshot diff between two corpus versions — the incremental-processing
    * primitive: re-running the pipeline over 100 TB because 0.1% of pages
    * re-crawled is the scale anti-pattern, so downstream stages consume
    * `added` ∪ `changed` (and retire `removed`) instead of the full corpus.
    * Change detection is by content fingerprint ([[TextAnalysis
    * .fingerprint]] — whitespace-normalized, case-folded), so a reformatted
    * page does not count as changed.
    *
    * Scale shape: both sides reduce to (id, fp) before the full-outer
    * equi-join on id — the shuffle carries 2 fingerprint columns, never
    * text; the prepared corpus ([[prepare]]) already HAS `fp`, making the
    * old side a column read.
    *
    * Emits one row per doc in either version: (idCol, status ∈
    * added|removed|changed|unchanged).
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id",
                 fpCol: Option[String] = None): DataFrame = {
    def side(df: DataFrame, as: String) = fpCol match {
      case Some(f) => df.select(col(idCol), col(f).as(as))
      case None => df.select(col(idCol),
        TextAnalysis.fingerprint(col(textCol)).as(as))
    }
    side(oldDocs, "_fp_old")
      .join(side(newDocs, "_fp_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_fp_old").isNull, "added")
          .when(col("_fp_new").isNull, "removed")
          .when(col("_fp_old") === col("_fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
