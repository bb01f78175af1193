package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, as a training-data pipeline needs both:
  *  - `bruteForceTopK`: exact cosine top-k of a *small* query set against the
  *    corpus — the query side is broadcast, the corpus is scanned once, and
  *    the per-query top-k is a window over per-query partitions (parallel
  *    across queries, never a global sort);
  *  - `lshTopK`: random-hyperplane LSH — corpus and queries hash to signature
  *    buckets; only same-bucket pairs are compared. The bucket join is the
  *    scale path: candidate count is corpus/2^bits per table, independent of
  *    corpus², so a 1000-executor cluster shuffles buckets, not all pairs.
  *
  * Dot products use `zip_with` + `aggregate` in double precision — pure
  * codegen'd column expressions, no UDFs.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, accumulated in double. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query id (queries ⊂ corpus by id). */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val queries = embeddings
      .where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val corpus = embeddings.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    corpus.crossJoin(broadcast(queries))          // broadcast: |queries| rows
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * ±1 from the parity of a fixed hash — reproducible across runs/engines.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    when(xxhash64(lit(plane), dim).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)

  /** Random-hyperplane signature: `bits` sign bits packed into a long. */
  def lshSignature(vec: Column, bits: Int, table: Int): Column =
    (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(table * 1000 + p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k via multi-table hyperplane LSH: union the candidate
    * sets from `tables` signature tables, dedup, exact-rerank candidates.
    */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              bits: Int = 8, tables: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigs = (0 until tables).map { t =>
      embeddings.select(col(idCol), col(vecCol),
        lit(t).as("tbl"), lshSignature(col(vecCol), bits, t).as("bucket"))
    }.reduce(_ unionAll _)
      .persist() // signatures are interpreted HOFs; compute once, not per join side
    val queries = sigs.where(col(idCol).isInCollection(queryIds))
      .select(col("tbl"), col("bucket"), col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val corpus = sigs.select(col("tbl"), col("bucket"),
      col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val cands = corpus.join(broadcast(queries), Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("qvec"), col("cvec"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("sim", cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
