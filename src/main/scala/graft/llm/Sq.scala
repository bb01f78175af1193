package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecExprs

/** Scalar quantization (SQ8) — the third leg of the vector-compression
  * family beside [[Pq]] (sub-vector codebooks) and [[Ivf]] (cell pruning).
  * Each dimension is quantized independently against the corpus per-dim
  * [lo, hi] range into an 8-bit code: simpler and faster to encode than PQ
  * (no codebook argmin — one multiply/floor per dim), decode is exact-form
  * (`lo + c/255·(hi−lo)`), and recall is higher than PQ at the same scan
  * cost for corpora without strong subspace structure. FAISS ships the same
  * trade as `SQ8`; at dim=768 a byte layout cuts the candidate scan 4× vs
  * float32.
  *
  * Determinism: bounds are exact per-dim min/max (engine-identical), encode
  * and the ADC distance are plain rational double arithmetic folded in
  * dimension order — the DuckDB oracle replays codes AND the full ranking
  * bit-for-bit (q_sq_codes, q_sq_adc). Codes are longs here for oracle
  * parity; a dedicated layout stores dim bytes (see [[Pq]]'s identical
  * trade on its code rows).
  *
  * Scale shape: bounds are one posexplode + per-dim min/max aggregate —
  * map-side combine keys by dimension, so the exchange carries dim rows per
  * partition, never corpus rows; encode is a narrow codegen'd map
  * ([[graft.functions.SqEncodeExpr]] with the parameter-sized bounds riding
  * the expression); the persisted index is one (id, codes) table plus a
  * dim-row bounds table; search broadcasts |queries| float vectors against
  * the code scan ([[graft.functions.SqAdcExpr]]).
  */
object Sq {

  /** Exact per-dim corpus bounds as (lo, hi) arrays — parameter-sized
    * (2 × dim doubles). One narrow posexplode feeding a dim-keyed min/max
    * aggregate: partial aggregation collapses each partition to dim rows
    * before the exchange.
    */
  def bounds(embeddings: DataFrame,
             vecCol: String = "embedding"): (Array[Double], Array[Double]) = {
    val rows = graft.core.Scratch.rebalance(embeddings)
      .select(posexplode(transform(col(vecCol), _.cast("double")))
        .as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min("x").as("lo"), max("x").as("hi"))
      .orderBy("pos").collect()
    require(rows.nonEmpty, "SQ bounds need a non-empty corpus")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getAs[Int]("pos") == i, "ragged embedding dims in SQ bounds")
    }
    (rows.map(_.getAs[Double]("lo")), rows.map(_.getAs[Double]("hi")))
  }

  /** The code table (idCol, codes: array<long>[dim]) — a narrow map (input
    * spread first against hollow-split scans, [[graft.core.Scratch.rebalance]]).
    */
  def encode(embeddings: DataFrame, lo: Array[Double], hi: Array[Double],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    graft.core.Scratch.rebalance(embeddings).select(col(idCol),
      VecExprs.sqEncode(col(vecCol), lo, hi).as("codes"))

  /** Build + persist the SQ index: `codes` (one row per corpus vector) and
    * `bounds` ((pos, lo, hi) — dim rows) under `indexPath`.
    */
  def buildIndex(embeddings: DataFrame, indexPath: String,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val sess = embeddings.sparkSession
    import sess.implicits._
    val (lo, hi) = bounds(embeddings, vecCol)
    encode(embeddings, lo, hi, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$indexPath/codes")
    lo.indices.map(i => (i.toLong, lo(i), hi(i)))
      .toDF("pos", "lo", "hi")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/bounds")
  }

  /** Reload persisted bounds (dim rows by construction; contiguity-checked
    * like [[Pq.readBooks]]).
    */
  def readBounds(spark: SparkSession,
                 indexPath: String): (Array[Double], Array[Double]) = {
    val rows = spark.read.parquet(s"$indexPath/bounds").orderBy("pos").collect()
    require(rows.nonEmpty, s"empty SQ bounds table at $indexPath")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getAs[Long]("pos") == i.toLong,
        s"non-contiguous SQ bounds pos at $indexPath")
    }
    (rows.map(_.getAs[Double]("lo")), rows.map(_.getAs[Double]("hi")))
  }

  /** Incremental maintenance: encode `newVectors` with the PERSISTED bounds
    * and append — same contract as [[Pq.appendToIndex]] (bounds stay fixed;
    * out-of-range values clamp to 0/255, so rebuild when the value
    * distribution drifts past the recorded range).
    */
  def appendToIndex(newVectors: DataFrame, indexPath: String,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit = {
    val (lo, hi) = readBounds(newVectors.sparkSession, indexPath)
    encode(newVectors, lo, hi, idCol, vecCol)
      .write.mode("append").parquet(s"$indexPath/codes")
  }

  /** Fold append accumulation back into the built layout — the mirror of
    * [[Pq.compactIndex]] for the SQ code table (id-clustered: the ADC scan
    * is corpus-wide, so compaction here buys bounded file counts and the
    * rerank join's id locality, not key skipping). Run with writers
    * quiesced. Returns (parquet files before, after).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String, idCol: String = "vec_id"): (Int, Int) =
    graft.core.Compaction.recluster(spark, s"$indexPath/codes",
      Seq(idCol), "graft.ann.codesPartitionBytes")

  /** ADC top-k against a prebuilt index: every corpus row scores one fused
    * dim-loop against the broadcast query vector; rank by (distance, id).
    * `nRerank > 0` refines that many ADC candidates per query by exact
    * cosine (the float vector is touched only for the short list);
    * `nRerank = 0` is the raw oracle-checked ranking.
    *
    * CONTRACT (shared with [[Pq.adcTopKFromIndex]]): `embeddings` must
    * cover every id in the persisted code table AND every requested query
    * id. The rerank path inner-joins candidates back to `embeddings`, so a
    * vector indexed via [[appendToIndex]]/StreamingAnn but absent here
    * silently vanishes from reranked results, and an uncovered query id
    * returns zero rows — keep the embeddings table append-consistent with
    * the index (the streaming tier appends both from the same batch).
    */
  def adcTopKFromIndex(embeddings: DataFrame, indexPath: String,
                       queryIds: Seq[Long], k: Int, nRerank: Int = 0,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val sess = embeddings.sparkSession
    import sess.implicits._
    require(queryIds.nonEmpty && queryIds.size <= 65536,
      s"SQ ADC broadcasts one float vector per query — got ${queryIds.size} queries")
    val (lo, hi) = readBounds(sess, indexPath)
    val codes = sess.read.parquet(s"$indexPath/codes")
    val queries = embeddings.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), _.cast("double")).as("_qv"))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getSeq[Double](1).toArray))
    val qdf = queries.map { case (qid, qv) => (qid, qv.toSeq) }.toSeq
      .toDF("query_id", "_qv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col(idCol))
    val adc = codes.crossJoin(broadcast(qdf))
      .where(col(idCol) =!= col("query_id"))
      .withColumn("dist", VecExprs.sqAdc(col("codes"), col("_qv"), lo, hi))
      .withColumn("rank", row_number().over(w).cast("long"))
    if (nRerank <= 0) {
      adc.where(col("rank") <= k)
        .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
    } else {
      val wr = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col(idCol))
      adc.where(col("rank") <= math.max(k, nRerank))
        .select(col("query_id"), col(idCol))
        .join(embeddings.select(col(idCol), col(vecCol)), idCol)
        .join(broadcast(qdf), "query_id")
        .withColumn("sim", Similarity.cosine(col("_qv"), col(vecCol)))
        .withColumn("rank", row_number().over(wr).cast("long"))
        .where(col("rank") <= k)
        .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
    }
  }

  /** Convenience: build the deterministic SQ index and ADC-search it — the
    * registered, oracle-checked shape. Production builds once and calls
    * [[adcTopKFromIndex]] per query batch.
    */
  def adcTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              nRerank: Int = 0, idCol: String = "vec_id",
              vecCol: String = "embedding",
              indexPath: Option[String] = None): DataFrame = {
    val path = indexPath.getOrElse(graft.core.TempDirs.scratch("sq"))
    buildIndex(embeddings, path, idCol, vecCol)
    adcTopKFromIndex(embeddings, path, queryIds, k, nRerank, idCol, vecCol)
  }
}
