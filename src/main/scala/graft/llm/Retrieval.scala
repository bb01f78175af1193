package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval over the corpus — the BM25 companion to the
  * dense-vector search in [[Similarity]]/[[Ivf]]/[[Pq]]. Training-data
  * pipelines use it for targeted corpus queries (find the docs about X),
  * eval-set mining, and as the lexical arm of hybrid retrieval.
  *
  * Scoring is BM25 with a RATIONAL idf: `idf = (N − df + ½)/(df + ½) + 1`
  * — the same monotone ranking as Robertson's `ln`-based idf for any fixed
  * df ordering, expressed without a transcendental so every score is plain
  * IEEE arithmetic and the DuckDB oracle hash-matches bit-for-bit (see
  * [[TextAnalysis.keywords]], which makes the identical trade; a `ln`
  * differs in the last ulp across libm builds). Rare terms weigh linearly
  * rather than logarithmically in df — fine for ranking, documented here
  * because absolute scores are NOT comparable to textbook BM25.
  *
  * Scale shape: the corpus is scanned once with a narrow tokenize; only
  * tokens that appear in SOME query survive the explode (`isInCollection`
  * compiles to a hash-set probe), so the term-frequency aggregate and
  * everything after it is sized by |docs matching any term|, not corpus
  * tokens. Document frequencies and the query-term table are broadcast;
  * corpus stats ride a broadcast single-row aggregate (no driver action).
  * Per-doc score terms fold in term order, so ranking is deterministic.
  */
object Retrieval {

  /** BM25 top-k: score `queries` (id → free-text) against every document,
    * return the best `k` docs per query as (query_id, idCol, score, rank).
    * Ranking ties break on document id; docs sharing no term with a query
    * score nothing and never surface.
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queries.nonEmpty && queries.size <= 65536,
      s"BM25 broadcasts the query-term table — got ${queries.size} queries")
    require(k > 0, s"k must be positive, got $k")
    val sess = docs.sparkSession
    import sess.implicits._

    val qTerms: Seq[(Long, String)] = queries.flatMap { case (qid, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }
    require(qTerms.nonEmpty, "no query has any term")
    val allTerms = qTerms.map(_._2).distinct
    val qTermDf = qTerms.toDF("query_id", "term")

    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val tokenized = docs.select(col(idCol),
      size(toks).cast("long").as("dl"),
      filter(toks, t => t.isInCollection(allTerms)).as("_hits"))
    // one row per (doc, query term present in it): corpus tokens that match
    // no query died before this explode
    val tf = tokenized
      .select(col(idCol), col("dl"), explode(col("_hits")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    // document frequency per query term ((id, term) is distinct above) and
    // corpus stats — both tiny, both broadcast
    val dfTable = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val stats = tokenized.agg(
      count(lit(1)).cast("long").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"))

    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0)
    val norm = lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))
    val partial = idf *
      (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") + norm)

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    tf.join(broadcast(dfTable), "term")
      .join(broadcast(qTermDf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_p", partial)
      .groupBy(col("query_id"), col(idCol))
      .agg(collect_list(struct(col("term"), col("_p").as("p"))).as("_ps"))
      // term-ordered left fold: deterministic double sum, and 0.0 + x ≡ x
      // so it matches the oracle's seedless list_reduce
      .withColumn("score",
        aggregate(transform(array_sort(col("_ps")), s => s.getField("p")),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"), col("rank"))
  }
}
