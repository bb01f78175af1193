package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecExprs

/** Product quantization (PQ) — the vector-COMPRESSION scale path beside the
  * cell-pruning IVF in [[Ivf]]. The vector is cut into `m` dim-slices; each
  * slice is quantized against its own `ksub`-entry codebook; a corpus row
  * stores m small codes (m longs here; m bytes in a dedicated layout)
  * instead of dim floats — at dim=768/m=64 that is a 48× memory cut, the
  * difference between an in-RAM and an on-disk candidate scan at 10⁹
  * vectors. Search is ADC (asymmetric distance): per query, one exact
  * [m × ksub] table of sub-distances is computed once, and every corpus row
  * scores with m table lookups ([[graft.functions.PqAdcExpr]]) — no float
  * vector is touched until the optional exact re-rank of the short list.
  *
  * Codebooks are corpus-derived and deterministic, like [[Ivf]]'s seeded
  * medoids: the sub-centroids of codebook j are the j-th dim-slices of the
  * `ksub` embeddings with the smallest md5-60("pq:" || id) — reproducible
  * on any engine, so the DuckDB oracle replays encode AND the full ADC
  * ranking bit-for-bit (q_pq_codes, q_pq_adc).
  *
  * Scale shape: codebooks are parameter-sized (dim × ksub doubles — NOT
  * corpus-derived in size) and ride the encode expression; encode is a
  * narrow codegen'd map; the persisted index is one (id, codes) table.
  * The ADC scan is a broadcast of |queries| LUTs against that table — the
  * same broadcast-small-side shape as [[Similarity.bruteForceTopK]], but
  * the big side carries codes, not vectors.
  */
object Pq {

  /** Deterministic seeded codebooks: [m][ksub][dim/m]. Sub-centroid c of
    * codebook j is the j-th slice of the c-th seed (seeds ordered by
    * (md5-60("pq:" || id), id) — the same bottom-k-by-salted-hash sampling
    * as [[Ivf.seedTable]], different salt).
    */
  def codebooks(embeddings: DataFrame, m: Int, ksub: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding",
                salt: String = "pq:"): Array[Array[Array[Double]]] = {
    require(m > 0 && ksub > 0, s"need m > 0 and ksub > 0, got m=$m ksub=$ksub")
    val h = graft.functions.CrossHashExprs.md5h60(
      concat(lit(salt), col(idCol).cast("string")))
    val seeds = embeddings
      .select(transform(col(vecCol), _.cast("double")).as("_v"), h.as("_h"),
        col(idCol))
      .orderBy(col("_h"), col(idCol)).limit(ksub)
      .select(col("_v")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == ksub,
      s"corpus has only ${seeds.length} vectors < ksub=$ksub")
    val dim = seeds(0).length
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      seeds.map(s => java.util.Arrays.copyOfRange(s, j * dsub, (j + 1) * dsub))
    }
  }

  /** The code table (idCol, codes: array<long>[m]) — a narrow codegen'd map
    * (input spread first: a hollow-split scan would run every vector's
    * m×ksub distance loop on one task — see [[graft.core.Scratch.rebalance]]).
    */
  def encode(embeddings: DataFrame, books: Array[Array[Array[Double]]],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    graft.core.Scratch.rebalance(embeddings).select(col(idCol),
      VecExprs.pqEncode(col(vecCol), books).as("codes"))

  /** Build + persist the PQ index: `codes` (one row per corpus vector) and
    * `books` ((j, c, centroid) — parameter-sized) under `indexPath`.
    */
  def buildIndex(embeddings: DataFrame, indexPath: String,
                 m: Int = 8, ksub: Int = 16,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val sess = embeddings.sparkSession
    import sess.implicits._
    val books = codebooks(embeddings, m, ksub, idCol, vecCol)
    encode(embeddings, books, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$indexPath/codes")
    books.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (cent, c) => (j.toLong, c.toLong, cent.toSeq) }
    }.toSeq.toDF("j", "c", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/books")
  }

  /** Reload persisted codebooks as the [m][ksub][dsub] kernel object
    * (parameter-sized by construction; contiguity-checked like
    * [[Ivf.readCentroids]]).
    */
  def readBooks(spark: SparkSession, indexPath: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$indexPath/books")
      .orderBy("j", "c").collect()
    require(rows.nonEmpty, s"empty PQ codebook table at $indexPath")
    val grouped = rows.groupBy(_.getAs[Long]("j")).toSeq.sortBy(_._1)
    grouped.zipWithIndex.foreach { case ((j, cb), i) =>
      require(j == i.toLong, s"non-contiguous PQ codebook j at $indexPath")
      cb.zipWithIndex.foreach { case (r, c) =>
        require(r.getAs[Long]("c") == c.toLong,
          s"non-contiguous PQ code c in codebook $j at $indexPath")
      }
    }
    grouped.map { case (_, cb) =>
      cb.map(_.getSeq[Double](cb(0).fieldIndex("centroid")).toArray)
    }.toArray
  }

  /** Incremental index maintenance: encode `newVectors` with the PERSISTED
    * codebooks and append their code rows — the mirror of
    * [[Ivf.appendToIndex]], same trade (codebooks stay fixed; rebuild when
    * quantization error drifts) and same id-uniqueness contract (the
    * streaming tier dedups ahead of the sink).
    */
  def appendToIndex(newVectors: DataFrame, indexPath: String,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit =
    encode(newVectors, readBooks(newVectors.sparkSession, indexPath),
      idCol, vecCol)
      .write.mode("append").parquet(s"$indexPath/codes")

  /** Fold append accumulation back into the built layout — the mirror of
    * [[Ivf.compactIndex]] for the code table. A residual index's codes
    * carry their IVF cell ([[buildResidualIndex]]) and recluster by it,
    * so the residual search's pushed `cell IN (probes)` skips row groups;
    * a flat index's codes recluster by id for the candidate join. Run
    * with writers quiesced. Returns (parquet files before, after).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String, idCol: String = "vec_id"): (Int, Int) = {
    val key =
      if (spark.read.parquet(s"$indexPath/codes").columns.contains("cell"))
        "cell" else idCol
    graft.core.Compaction.recluster(spark, s"$indexPath/codes",
      Seq(key), "graft.ann.codesPartitionBytes")
  }

  /** One query's flattened [m × ksub] LUT: lut(j·ksub + c) = ‖q_slice_j −
    * books(j)(c)‖², each accumulated left-to-right like [[encode]]'s kernel.
    */
  private[llm] def lutFor(q: Array[Double],
                          books: Array[Array[Array[Double]]]): Array[Double] = {
    val m = books.length
    val ksub = books(0).length
    val dsub = books(0)(0).length
    require(q.length == m * dsub,
      s"query dim ${q.length} != m*dsub = ${m * dsub}")
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var c = 0
      while (c < ksub) {
        val cent = books(j)(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = q(base + i) - cent(i)
          acc += d * d
          i += 1
        }
        lut(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    lut
  }

  /** ADC top-k against a prebuilt index: every corpus row scores with m
    * LUT lookups; rank by (distance, id). `nRerank > 0` re-ranks that many
    * ADC candidates per query by exact cosine against the float vectors
    * (the standard PQ short-list refinement; touches nRerank vectors per
    * query instead of the corpus). `nRerank = 0` returns the raw ADC
    * ranking — the oracle-checked shape.
    *
    * CONTRACT: `embeddings` must cover every indexed id and every query id
    * — see [[Sq.adcTopKFromIndex]] for the full statement (the rerank join
    * silently drops uncovered candidates).
    */
  def adcTopKFromIndex(embeddings: DataFrame, indexPath: String,
                       queryIds: Seq[Long], k: Int, nRerank: Int = 0,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val sess = embeddings.sparkSession
    import sess.implicits._
    require(queryIds.nonEmpty && queryIds.size <= 65536,
      s"ADC broadcasts one LUT per query — got ${queryIds.size} queries")
    val books = readBooks(sess, indexPath)
    val ksub = books(0).length
    val codes = sess.read.parquet(s"$indexPath/codes")
    val queries = embeddings.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), _.cast("double")).as("_qv"))
      .collect()
      .map(r => (r.getAs[Long]("query_id"),
        r.getSeq[Double](1).toArray))
    val luts = queries
      .map { case (qid, qv) => (qid, lutFor(qv, books).toSeq) }.toSeq
      .toDF("query_id", "_lut")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col(idCol))
    val adc = codes.crossJoin(broadcast(luts))
      .where(col(idCol) =!= col("query_id"))
      .withColumn("dist", VecExprs.pqAdc(col("codes"), col("_lut"), ksub))
      .withColumn("rank", row_number().over(w).cast("long"))
    if (nRerank <= 0) {
      adc.where(col("rank") <= k)
        .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
    } else {
      val qvecs = queries.map { case (qid, qv) => (qid, qv.toSeq) }.toSeq
        .toDF("query_id", "_qvec")
      val wr = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col(idCol))
      adc.where(col("rank") <= math.max(k, nRerank))
        .select(col("query_id"), col(idCol))
        .join(embeddings.select(col(idCol), col(vecCol)), idCol)
        .join(broadcast(qvecs), "query_id")
        .withColumn("sim", Similarity.cosine(col("_qvec"), col(vecCol)))
        .withColumn("rank", row_number().over(wr).cast("long"))
        .where(col("rank") <= k)
        .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
    }
  }

  /** Convenience: build the deterministic PQ index (or reuse `indexPath`)
    * and ADC-search it — the registered, oracle-checked shape.
    */
  def adcTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              m: Int = 8, ksub: Int = 16, nRerank: Int = 0,
              idCol: String = "vec_id", vecCol: String = "embedding",
              indexPath: Option[String] = None): DataFrame = {
    val path = indexPath.getOrElse(graft.core.TempDirs.scratch("pq"))
    buildIndex(embeddings, path, m, ksub, idCol, vecCol)
    adcTopKFromIndex(embeddings, path, queryIds, k, nRerank, idCol, vecCol)
  }

  /** IVF + PQ composed — the standard billion-scale ANN layout (an IVFADC
    * index): the IVF coarse quantizer prunes the corpus to the probed
    * cells' candidates, and PQ codes rank ONLY those candidates with m LUT
    * lookups each. Re-expressed as joins: candidates = probes ⋈ cells ⋈
    * codes; no float vector is touched unless `nRerank > 0` refines the
    * short list by exact cosine.
    *
    * Why both tiers: at 10⁹ vectors IVF alone still exact-scores
    * ~corpus·nProbe/nCells float vectors per query (memory-bandwidth
    * bound), and PQ alone still scans every code row. Composed, a query
    * touches nProbe/nCells of the CODE table — cells prune I/O, codes cut
    * bytes-per-candidate ~(4·dim/m)×.
    *
    * Ranking is (ADC distance, id) with the same subspace-ordered fold as
    * [[adcTopKFromIndex]], so with exhaustive probes (nProbe ≥ nCells) the
    * result EQUALS plain ADC — the spec pins that, and the oracle replays
    * the probed ranking bit-for-bit (q_ann_ivfpq).
    */
  def ivfPqTopKFromIndexes(embeddings: DataFrame, ivfPath: String,
                           pqPath: String, queryIds: Seq[Long], k: Int,
                           nProbe: Int = 4, nRerank: Int = 0,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val sess = embeddings.sparkSession
    import sess.implicits._
    require(queryIds.nonEmpty && queryIds.size <= 65536,
      s"ADC broadcasts one LUT per query — got ${queryIds.size} queries")
    val books = readBooks(sess, pqPath)
    val ksub = books(0).length
    val codes = sess.read.parquet(s"$pqPath/codes")
    val queryFrame = embeddings.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val (probes, probedCells) = Ivf.collectedProbes(queryFrame, ivfPath, nProbe)
    // pushed `cell IN (...)`: row-group skipping on a compacted index —
    // the broadcast probe join alone would still open every cells file
    val cells = Ivf.prunedScan(sess.read.parquet(s"$ivfPath/cells"),
      "cell", probedCells)
    val queries = queryFrame
      .select(col("query_id"), transform(col("qvec"), _.cast("double")).as("_qv"))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getSeq[Double](1).toArray))
    val luts = queries
      .map { case (qid, qv) => (qid, lutFor(qv, books).toSeq) }.toSeq
      .toDF("query_id", "_lut")
    val cand = cells.join(broadcast(probes), Seq("cell"))
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col(idCol))
    val adc = cand.join(codes, idCol)
      .join(broadcast(luts), "query_id")
      .withColumn("dist", VecExprs.pqAdc(col("codes"), col("_lut"), ksub))
      .withColumn("rank", row_number().over(w).cast("long"))
    if (nRerank <= 0) {
      adc.where(col("rank") <= k)
        .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
    } else {
      val qvecs = queries.map { case (qid, qv) => (qid, qv.toSeq) }.toSeq
        .toDF("query_id", "_qvec")
      val wr = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col(idCol))
      adc.where(col("rank") <= math.max(k, nRerank))
        .select(col("query_id"), col(idCol))
        .join(embeddings.select(col(idCol), col(vecCol)), idCol)
        .join(broadcast(qvecs), "query_id")
        .withColumn("sim", Similarity.cosine(col("_qvec"), col(vecCol)))
        .withColumn("rank", row_number().over(wr).cast("long"))
        .where(col("rank") <= k)
        .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
    }
  }

  /** Convenience: build both deterministic indexes and run the composed
    * search — the registered, oracle-checked shape. Production builds each
    * index once and calls [[ivfPqTopKFromIndexes]] per query batch.
    */
  def ivfPqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                nCells: Int = 0, nProbe: Int = 4,
                m: Int = 8, ksub: Int = 16, nRerank: Int = 0,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ivfPath = graft.core.TempDirs.scratch("ivfpq_ivf")
    val pqPath = graft.core.TempDirs.scratch("ivfpq_pq")
    Ivf.buildIndexSeeded(embeddings, ivfPath, nCells, idCol, vecCol)
    buildIndex(embeddings, pqPath, m, ksub, idCol, vecCol)
    ivfPqTopKFromIndexes(embeddings, ivfPath, pqPath, queryIds, k, nProbe,
      nRerank, idCol, vecCol)
  }

  // ------------------------------------------------- residual IVFADC

  /** Residual of every corpus vector against its assigned IVF centroid —
    * the frame PQ trains and encodes on in a RESIDUAL index. Exact double
    * subtraction per component (the seeded quantizer's centroids are
    * medoids, i.e. real corpus vectors), so residuals are deterministic
    * and oracle-replayable.
    */
  private def residuals(embeddings: DataFrame, ivfPath: String,
                        idCol: String, vecCol: String): DataFrame = {
    val sess = embeddings.sparkSession
    val cells = sess.read.parquet(s"$ivfPath/cells")
    val cent = sess.read.parquet(s"$ivfPath/centroids")
    embeddings.join(cells, idCol)
      .join(cent, "cell")
      .select(col(idCol), col("cell"),
        zip_with(transform(col(vecCol), _.cast("double")), col("centroid"),
          (a, b) => a - b).as("rv"))
  }

  /** FAISS-style residual IVFADC index: PQ codebooks trained on (and codes
    * computed from) `x − centroid(cell(x))` instead of raw vectors. With
    * the same bit budget the residual distribution is tighter than the raw
    * one (the coarse quantizer already explains the between-cell
    * variance), so quantization error — and ADC ranking error — drops;
    * the price is one LUT per (query, probed cell) instead of one per
    * query. Codes persist WITH their cell so the query path joins LUTs
    * straight onto the code table.
    */
  def buildResidualIndex(embeddings: DataFrame, ivfPath: String,
                         pqPath: String, m: Int = 8, ksub: Int = 16,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit = {
    val sess = embeddings.sparkSession
    import sess.implicits._
    val res = residuals(embeddings, ivfPath, idCol, vecCol)
    val books = codebooks(res, m, ksub, idCol, "rv", salt = "pqr:")
    res.select(col(idCol), col("cell"),
        VecExprs.pqEncode(col("rv"), books).as("codes"))
      .write.mode("overwrite").parquet(s"$pqPath/codes")
    books.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (c0, c) => (j.toLong, c.toLong, c0.toSeq) }
    }.toSeq.toDF("j", "c", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$pqPath/books")
  }

  /** Search the residual index: the LUT table carries one entry per
    * (query, probed cell) — `‖(q − centroid_cell)_slice − codebook‖²` —
    * and doubles as the probe filter: joining the cell-keyed code table to
    * the broadcast LUTs on `cell` IS the candidate selection, so the
    * plan is one broadcast-hash join + the ADC kernel + the top-k window.
    */
  def ivfPqResidualTopKFromIndexes(embeddings: DataFrame, ivfPath: String,
                                   pqPath: String, queryIds: Seq[Long],
                                   k: Int, nProbe: Int = 4,
                                   idCol: String = "vec_id",
                                   vecCol: String = "embedding"): DataFrame = {
    val sess = embeddings.sparkSession
    import sess.implicits._
    require(queryIds.nonEmpty && queryIds.size <= 65536,
      s"residual ADC broadcasts nProbe LUTs per query — got ${queryIds.size}")
    val books = readBooks(sess, pqPath)
    val ksub = books(0).length
    val centroids = Ivf.readCentroids(sess, ivfPath)
    val queryFrame = embeddings.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val probePairs = Ivf.probeTable(queryFrame, ivfPath, nProbe)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cell")))
    val qvs = queryFrame
      .select(col("query_id"), transform(col("qvec"), _.cast("double")).as("_qv"))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getSeq[Double](1).toArray))
      .toMap
    val luts = probePairs.toSeq.map { case (qid, cell) =>
      val q = qvs(qid)
      val c = centroids(cell.toInt)
      val rq = Array.tabulate(q.length)(i => q(i) - c(i))
      (qid, cell, lutFor(rq, books).toSeq)
    }.toDF("query_id", "cell", "_lut")
    // pushed `cell IN (...)` on the cell-keyed code table: the broadcast
    // LUT join alone is the candidate selection but still opens every
    // codes file — the IN filter lets a compacted index skip row groups
    val probedCells = probePairs.map(_._2).distinct.sorted.toSeq
    val codes = Ivf.prunedScan(sess.read.parquet(s"$pqPath/codes"),
      "cell", probedCells)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col(idCol))
    codes.join(broadcast(luts), "cell")
      .where(col(idCol) =!= col("query_id"))
      .withColumn("dist", VecExprs.pqAdc(col("codes"), col("_lut"), ksub))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
  }

  /** Convenience: build the IVF index and the residual PQ index, then run
    * the composed residual search — the registered, oracle-checked shape.
    */
  def ivfPqResidualTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                        nCells: Int = 0, nProbe: Int = 4,
                        m: Int = 8, ksub: Int = 16,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val ivfPath = graft.core.TempDirs.scratch("ivfpqr_ivf")
    val pqPath = graft.core.TempDirs.scratch("ivfpqr_pq")
    Ivf.buildIndexSeeded(embeddings, ivfPath, nCells, idCol, vecCol)
    buildResidualIndex(embeddings, ivfPath, pqPath, m, ksub, idCol, vecCol)
    ivfPqResidualTopKFromIndexes(embeddings, ivfPath, pqPath, queryIds, k,
      nProbe, idCol, vecCol)
  }
}
