package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path beside the hyperplane LSH in [[Similarity]].
  *
  * Index: KMeans partitions the corpus into `nCells` coarse cells; each
  * vector stores its cell id (one narrow column). Search: each query probes
  * its `nProbe` nearest centroids (a driver-side computation over the
  * centroid table — nCells × dim floats, metadata-sized) and exact-reranks
  * only the vectors in those cells. At 100 TB the corpus shuffles once at
  * index build; a search touches ~nProbe/nCells of the data, pruned by the
  * cell column before any distance math.
  */
object Ivf {

  /** Build the IVF index: corpus + `cell` column, and the centroid model. */
  def buildIndex(embeddings: DataFrame, nCells: Int, seed: Long = 42L,
                 idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Array[Vector]) = {
    val vecs = embeddings.withColumn("_v", array_to_vector(col(vecCol)))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("_v").setPredictionCol("cell")
      .fit(vecs)
    (model.transform(vecs).drop("_v"), model.clusterCenters)
  }

  /** Approximate top-k: probe the `nProbe` nearest cells per query, rerank
    * candidates by exact cosine.
    */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (indexed, centers) = buildIndex(embeddings, nCells, seed, idCol, vecCol)
    val sess = embeddings.sparkSession
    import sess.implicits._

    // The query set is small by contract; its vectors come to the driver to
    // pick probe cells against the (tiny) centroid table.
    val queryVecs: Map[Long, Seq[Float]] = embeddings
      .where(col(idCol).isInCollection(queryIds))
      .select(col(idCol), col(vecCol))
      .as[(Long, Seq[Float])].collect().toMap

    def dist2(q: Seq[Float], c: Vector): Double =
      q.zip(c.toArray).map { case (x, y) => (x - y) * (x - y) }.sum

    val probes = queryVecs.toSeq.flatMap { case (qid, qv) =>
      centers.zipWithIndex.sortBy { case (c, _) => dist2(qv, c) }
        .take(nProbe).map { case (_, cellId) => (qid, cellId) }
    }.toDF("query_id", "cell")

    val queries = embeddings.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol))
    indexed
      .join(broadcast(probes), Seq("cell"))                    // prune to probed cells
      .where(col(idCol) =!= col("query_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("sim", Similarity.cosine(col("qvec"), col(vecCol)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
  }
}
