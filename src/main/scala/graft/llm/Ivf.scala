package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path beside the hyperplane LSH in [[Similarity]].
  *
  * Index (**built once, persisted**): a coarse quantizer partitions the
  * corpus into `nCells` cells; the index on disk is two Parquet tables —
  * `cells` (vec_id, cell: one narrow column per corpus row) and `centroids`
  * (cell, centroid). Search reads the index, probes each query's `nProbe`
  * nearest centroids (a broadcast join against the centroid table —
  * nCells × dim doubles, metadata-sized) and exact-reranks only the vectors
  * in those cells. At 100 TB the corpus shuffles once at index build; a
  * search touches ~nProbe/nCells of the data, pruned by the cell column
  * before any distance math.
  *
  * Two quantizers:
  *  - [[buildIndexKMeans]] — Spark ML KMeans, the quality path;
  *  - [[buildIndexSeeded]] — centroids are the embeddings of a
  *    **corpus-derived** seed-id set (a one-step k-medoid): the nCells ids
  *    with the smallest md5-60("seed:" || id). Deterministic, works on ANY
  *    id space (no fixture coupling), and SQL-expressible, so the DuckDB
  *    oracle replicates the whole IVF search bit-for-bit; also a legitimate
  *    cheap coarse quantizer at scale (hash-sampled medoids).
  */
object Ivf {

  /** Cell-count default: nCells ≈ corpusSize / targetCellSize, floored at
    * minCells. Within-cell pairing (SemDeDup) and probe rerank are
    * O(|cell|²) / O(|cell|) — holding the TARGET CELL SIZE constant (not the
    * cell count) is what keeps those costs linear in the corpus: at 10⁹
    * vectors this yields ~10⁷ cells, the SemDeDup-at-scale regime.
    */
  def derivedNCells(corpusSize: Long, targetCellSize: Int = 64,
                    minCells: Int = 16): Int =
    math.max(minCells, math.ceil(corpusSize.toDouble / targetCellSize).toInt)

  /** Corpus-derived deterministic seed table (idCol, cell): the nCells ids
    * with the smallest md5-60("seed:" || id), cell-numbered in (hash, id)
    * order. Bottom-k by a salted hash is a uniform pseudo-random sample that
    * any engine reproduces (oracle: row_number over the same hash) and that
    * exists by construction in every id space. Plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort); the
    * follow-up rank window touches only the nCells surviving rows.
    */
  def seedTable(embeddings: DataFrame, nCells: Int,
                idCol: String = "vec_id"): DataFrame = {
    val h = conv(substring(md5(concat(lit("seed:"), col(idCol).cast("string"))),
      1, 15), 16, 10).cast("long")
    embeddings.select(col(idCol), h.as("_h"))
      .orderBy(col("_h"), col(idCol))
      .limit(nCells)
      .withColumn("cell", (row_number().over(
        Window.orderBy(col("_h"), col(idCol))) - 1).cast("long"))
      .drop("_h")
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** The centroid matrix, collected from a persisted index. nCells × dim
    * doubles — metadata-sized by design (the whole point of a COARSE
    * quantizer), so the driver round-trip is the expression-level analog of
    * broadcasting the centroid table; the assignment/probe kernels then run
    * one tight loop per row inside codegen instead of a |corpus| × nCells
    * interpreted-fold crossJoin.
    */
  private[llm] def readCentroids(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(s"$indexPath/centroids").orderBy("cell").collect()
    require(rows.nonEmpty, s"empty centroid table at $indexPath")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getAs[Long]("cell") == i.toLong,
        s"centroid table has non-contiguous cells at $indexPath")
    }
    rows.map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
  }

  /** Build + persist the seeded-medoid index: each vector is assigned to its
    * nearest seed embedding (ties → lowest cell). The argmin is a `min_by`
    * over a (dist², cell) struct — a partial-aggregatable hash aggregate
    * with map-side combine, not a per-key window sort: at corpus scale the
    * assignment is one shuffle of pre-combined (id, best-cell) pairs.
    *
    * `nCells <= 0` (the default) derives the cell count from the corpus size
    * ([[derivedNCells]]); seeds come from the corpus itself ([[seedTable]]).
    */
  def buildIndexSeeded(embeddings: DataFrame, indexPath: String, nCells: Int = 0,
                       idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val sess = embeddings.sparkSession
    val k = if (nCells > 0) nCells else derivedNCells(embeddings.count())
    val seeds = seedTable(embeddings, k, idCol)
    val centroids = embeddings.join(broadcast(seeds), idCol)
      .select(col("cell"), asDouble(col(vecCol)).as("centroid"))
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$indexPath/centroids")
    // assignment: one argmin kernel per row (ties → lowest cell), a narrow
    // codegen'd map over the corpus — no crossJoin, no per-pair fold
    val centArr = readCentroids(sess, indexPath)
    val cells = embeddings.select(col(idCol),
      graft.functions.VecExprs.ivfCell(col(vecCol), centArr).as("cell"))
    cells.write.mode("overwrite").parquet(s"$indexPath/cells")
  }

  /** Build + persist a KMeans index (same on-disk layout as the seeded one). */
  def buildIndexKMeans(embeddings: DataFrame, indexPath: String, nCells: Int = 16,
                       seed: Long = 42L, idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit = {
    val sess = embeddings.sparkSession
    import sess.implicits._
    val vecs = embeddings.withColumn("_v", array_to_vector(col(vecCol)))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("_v").setPredictionCol("cell")
      .fit(vecs)
    model.transform(vecs).select(col(idCol), col("cell").cast("long").as("cell"))
      .write.mode("overwrite").parquet(s"$indexPath/cells")
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/centroids")
  }

  /** Approximate top-k against a prebuilt index: probe the `nProbe` nearest
    * cells per query (broadcast centroid join + per-query window), rerank
    * candidates in the probed cells by exact cosine.
    */
  def ivfTopKFromIndex(embeddings: DataFrame, indexPath: String,
                       queryIds: Seq[Long], k: Int, nProbe: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sess = embeddings.sparkSession
    val cells = sess.read.parquet(s"$indexPath/cells")

    val queries = embeddings.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    // nProbe nearest cells per query from one kernel call (ordered by
    // (d², cell) like the oracle's probe window), exploded to join keys
    val centArr = readCentroids(sess, indexPath)
    val probes = queries.select(col("query_id"),
      explode(graft.functions.VecExprs.ivfProbes(col("qvec"), centArr, nProbe))
        .as("cell"))

    val indexed = embeddings.join(cells, idCol)   // (vec_id, embedding, cell)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol))
    indexed
      .join(broadcast(probes), Seq("cell"))       // prune to probed cells
      .where(col(idCol) =!= col("query_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("sim", Similarity.cosine(col("qvec"), col(vecCol)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
  }

  /** Convenience: build the deterministic seeded index into `indexPath` (or
    * a fresh scratch dir) and query it — the registered, oracle-checked
    * shape. Production keeps the build and the query as separate steps.
    */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              nCells: Int = 0, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              indexPath: Option[String] = None): DataFrame = {
    val path = indexPath.getOrElse(
      graft.core.TempDirs.scratch("ivf"))
    buildIndexSeeded(embeddings, path, nCells, idCol, vecCol)
    ivfTopKFromIndex(embeddings, path, queryIds, k, nProbe, idCol, vecCol)
  }
}
