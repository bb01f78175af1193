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
  * nearest centroids and exact-reranks only the vectors in those cells. At
  * 100 TB the corpus shuffles once at index build; a search touches
  * ~nProbe/nCells of the data, pruned by the cell column before any
  * distance math.
  *
  * The centroid table is kernel-sized only up to `graft.ivf.kernelMaxCells`
  * (default 4096): at or below the gate it is collected once and rides the
  * assignment/probe expressions; above it (the derived-nCells regime —
  * ~10⁷ cells at 10⁹ vectors) centroids stay distributed and assignment
  * runs as the two-level join ([[assignCellsTwoLevel]]) — the full set is
  * never materialized on the driver.
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
    * vectors this yields ~10⁷ cells, the SemDeDup-at-scale regime. Above
    * [[kernelMaxCells]] cells the assignment/probe automatically switch from
    * the driver-held-matrix kernel to the join-based two-level scheme
    * ([[assignCellsTwoLevel]]), so the derived count composes with the
    * driver-memory budget at any corpus size.
    */
  def derivedNCells(corpusSize: Long, targetCellSize: Int = 64,
                    minCells: Int = 16): Int =
    math.max(minCells, math.ceil(corpusSize.toDouble / targetCellSize).toInt)

  /** Cell-count gate for the driver-matrix kernel path: at or below this
    * many centroids, the matrix is collected once and rides the
    * assignment/probe expressions (`addReferenceObj` — the expression-level
    * broadcast join, O(nCells) distance evals per row); ABOVE it, the
    * centroids never leave the cluster and assignment runs as the two-level
    * join ([[assignCellsTwoLevel]], O(√nCells · coarseProbes) per row).
    * Same size-vs-strategy trade as `graft.cc.driverMaxEdges`. The 4096
    * default keeps the matrix ≤ a few MB at typical dims.
    */
  private[llm] def kernelMaxCells(sess: org.apache.spark.sql.SparkSession): Int =
    sess.conf.getOption("graft.ivf.kernelMaxCells").map(_.toInt).getOrElse(4096)

  /** How many coarse cells a row probes before fine assignment on the
    * two-level path. The fine search space is the union of the probed coarse
    * groups (~coarseProbes·√nCells centroids instead of nCells); more probes
    * close the gap to the flat argmin at linear extra cost.
    */
  private[llm] def coarseProbes(sess: org.apache.spark.sql.SparkSession): Int =
    sess.conf.getOption("graft.ivf.coarseProbes").map(_.toInt).getOrElse(8)

  /** Corpus-derived deterministic seed table (idCol, cell): the nCells ids
    * with the smallest md5-60("seed:" || id), cell-numbered in (hash, id)
    * order. Bottom-k by a salted hash is a uniform pseudo-random sample that
    * any engine reproduces (oracle: row_number over the same hash) and that
    * exists by construction in every id space.
    *
    * Small nCells (≤ [[kernelMaxCells]]) plans as TakeOrderedAndProject
    * (per-partition heaps) + a rank window over only the surviving rows.
    * Large nCells would funnel those rows through a single-partition limit
    * and window, so the numbering switches to a range-partitioned sort +
    * the two-pass zipWithIndex ([[graft.operators.GlobalOrder]]) — same
    * (hash, id) ordering, no single-task stage.
    */
  def seedTable(embeddings: DataFrame, nCells: Int,
                idCol: String = "vec_id"): DataFrame = {
    val h = graft.functions.CrossHashExprs.md5h60(
      concat(lit("seed:"), col(idCol).cast("string")))
    val hashed = embeddings.select(col(idCol), h.as("_h"))
    if (nCells <= kernelMaxCells(embeddings.sparkSession)) {
      hashed.orderBy(col("_h"), col(idCol))
        .limit(nCells)
        .withColumn("cell", (row_number().over(
          Window.orderBy(col("_h"), col(idCol))) - 1).cast("long"))
        .drop("_h")
    } else {
      // Bottom-k prefilter: the global sort only needs the nCells smallest
      // hashes, so sorting the WHOLE corpus (the round-6 shape) wastes
      // ~corpus/nCells of the sort input. md5-60 is uniform on [0, 2^60), so
      // rows with _h below ~nCells/n · 2^60 · margin are a count-verified
      // superset of the true bottom-nCells (margin 4 makes an undershoot a
      // vanishing-tail event); on undershoot we fall back to the full sort.
      // The numbering is unchanged either way: any superset of the bottom
      // nCells rows sorts them to the same (hash, id) positions.
      val n = embeddings.count()
      val cap = math.min(h60Max.toDouble,
        math.ceil(nCells.toDouble / math.max(n, 1L) * h60Max.toDouble * 4.0))
      val pre = hashed.where(col("_h") < lit(cap.toLong))
      val src = if (n > nCells && pre.count() >= nCells) pre else hashed
      graft.operators.GlobalOrder.withGlobalSeq(src, Seq("_h", idCol), "cell")
        .where(col("cell") < nCells)
        .select(col(idCol), col("cell"))
    }
  }

  /** Exclusive upper bound of the md5-60 hash family (15 hex chars). */
  private val h60Max: Long = 1L << 60

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** The centroid matrix, collected from a persisted index — the KERNEL-path
    * companion, hard-gated to ≤ [[kernelMaxCells]] rows: at that size the
    * driver round-trip is the expression-level analog of broadcasting the
    * centroid table, and the assignment/probe kernels run one tight loop per
    * row inside codegen instead of a |corpus| × nCells interpreted-fold
    * crossJoin. A larger quantizer must never land here (a derived 10⁷-cell
    * index would be a multi-GB driver array) — those take the join paths.
    */
  private[llm] def readCentroids(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String): Array[Array[Double]] = {
    val table = spark.read.parquet(s"$indexPath/centroids")
    val n = table.count()
    require(n <= kernelMaxCells(spark),
      s"centroid table at $indexPath has $n cells > " +
        s"graft.ivf.kernelMaxCells=${kernelMaxCells(spark)}; the driver-matrix " +
        "kernel path is gated off at this size — use the join-based paths")
    val rows = table.orderBy("cell").collect()
    require(rows.nonEmpty, s"empty centroid table at $indexPath")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getAs[Long]("cell") == i.toLong,
        s"centroid table has non-contiguous cells at $indexPath")
    }
    rows.map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
  }

  /** Flat kernel assignment (idCol, cell): one argmin kernel per row (ties →
    * lowest cell), a narrow codegen'd map over the corpus. Requires the
    * centroid matrix on the driver — callers gate on [[kernelMaxCells]].
    */
  private[llm] def assignCellsKernel(embeddings: DataFrame,
                                     centArr: Array[Array[Double]],
                                     idCol: String, vecCol: String): DataFrame =
    embeddings.select(col(idCol),
      graft.functions.VecExprs.ivfCell(col(vecCol), centArr).as("cell"))

  /** Two-level assignment (idCol, cell) for quantizers too large for a
    * driver-held matrix. √nCells coarse seeds are drawn deterministically
    * from the FINE centroid table (bottom-k by md5-60("coarse:" || cell) —
    * the same corpus-derived sampling trick one level up); fine centroids
    * group under their nearest coarse seed; each corpus row probes its
    * [[coarseProbes]] nearest coarse seeds with the existing kernel (the
    * coarse matrix is √nCells rows — ALWAYS kernel-sized: one level reaches
    * nCells ~ kernelMaxCells² ≈ 1.6×10⁷, the 10⁹-vector regime) and
    * fine-assigns via a distributed equi-join on the coarse key + a
    * `min(struct(d2, cell))` hash aggregate (map-side combinable — the
    * shuffle carries one pre-combined (id, best) pair per row, never the
    * candidate fan-out). Per-row cost drops from O(nCells) to
    * O(coarseProbes · √nCells) distance evals, and no full centroid set is
    * ever materialized on the driver.
    *
    * The fine distance ([[graft.functions.L2SqExpr]]) accumulates exactly
    * like the flat kernel's loop and the (d2, cell) struct-min matches its
    * tie rule, so wherever the true nearest centroid's coarse group is
    * probed the assignment is IDENTICAL to the flat path; coarseProbes is
    * the (configurable) approximation knob, the standard IVF-quantizer
    * trade at this scale.
    */
  private[llm] def assignCellsTwoLevel(embeddings: DataFrame, centroids: DataFrame,
                                       idCol: String, vecCol: String): DataFrame = {
    val sess = embeddings.sparkSession
    val nProbeCoarse = coarseProbes(sess)
    val (coarseArr, fine) = coarseGrouping(centroids)
    val probed = embeddings.select(col(idCol), col(vecCol),
        explode(graft.functions.VecExprs.ivfProbes(col(vecCol), coarseArr,
          nProbeCoarse)).as("coarse"))
    probed.join(fine, Seq("coarse"))
      .select(col(idCol),
        struct(graft.functions.VecExprs.l2Sq(col(vecCol), col("centroid")).as("d2"),
          col("cell").as("cell")).as("_dc"))
      .groupBy(col(idCol)).agg(min(col("_dc")).as("_best"))
      .select(col(idCol), col("_best.cell").as("cell"))
  }

  /** Coarse machinery shared by the two-level assignment AND probe paths:
    * √nFine coarse seeds drawn deterministically from the fine centroid
    * table (bottom-k by md5-60("coarse:" || cell) — the corpus-derived
    * sampling trick one level up) plus the fine table grouped under each
    * centroid's nearest coarse seed (a narrow kernel map). The coarse matrix
    * is ALWAYS kernel-sized: one level reaches nCells ~ kernelMaxCells² ≈
    * 1.6×10⁷, the 10⁹-vector regime.
    */
  private[llm] def coarseGrouping(centroids: DataFrame)
      : (Array[Array[Double]], DataFrame) = {
    val sess = centroids.sparkSession
    val ch = graft.functions.CrossHashExprs.md5h60(
      concat(lit("coarse:"), col("cell").cast("string")))
    val nFine = centroids.count()
    val coarseK = math.max(16, math.ceil(math.sqrt(nFine.toDouble)).toInt)
    require(coarseK <= kernelMaxCells(sess),
      s"two-level IVF: √$nFine = $coarseK coarse cells exceed " +
        s"kernelMaxCells=${kernelMaxCells(sess)} — raise the gate or add a level")
    val coarseArr = centroids.select(col("cell"), col("centroid"), ch.as("_h"))
      .orderBy(col("_h"), col("cell")).limit(coarseK)
      .select(col("centroid")).collect()
      .map(_.getSeq[Double](0).toArray)
    val fine = centroids.select(
      graft.functions.VecExprs.ivfCell(col("centroid"), coarseArr).as("coarse"),
      col("cell"), col("centroid"))
    (coarseArr, fine)
  }

  /** Build + persist the seeded-medoid index: each vector is assigned to its
    * nearest seed embedding (ties → lowest cell).
    *
    * `nCells <= 0` (the default) derives the cell count from the corpus size
    * ([[derivedNCells]]); seeds come from the corpus itself ([[seedTable]]).
    * Assignment is the flat kernel up to [[kernelMaxCells]] centroids and
    * the join-based two-level scheme above it — the derived count therefore
    * composes with driver memory at ANY corpus size.
    */
  def buildIndexSeeded(embeddings: DataFrame, indexPath: String, nCells: Int = 0,
                       idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val sess = embeddings.sparkSession
    val k = if (nCells > 0) nCells else derivedNCells(embeddings.count())
    val small = k <= kernelMaxCells(sess)
    val seeds = seedTable(embeddings, k, idCol)
    val centroids = embeddings
      .join(if (small) broadcast(seeds) else seeds, idCol)
      .select(col("cell"), asDouble(col(vecCol)).as("centroid"))
    // one small file (and the contiguity check) for a kernel-sized table;
    // sharded by cell range above the gate — nothing downstream needs one file
    val centOut = if (small) centroids.coalesce(1)
                  else centroids.repartitionByRange(col("cell"))
    centOut.write.mode("overwrite").parquet(s"$indexPath/centroids")
    assignWithIndex(embeddings, indexPath, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$indexPath/cells")
  }

  /** Assign a vector frame against the PERSISTED quantizer — the assignment
    * half of [[buildIndexSeeded]], gated the same way (kernel at or below
    * [[kernelMaxCells]], two-level join above), reusable for incremental
    * appends.
    */
  private[llm] def assignWithIndex(vectors: DataFrame, indexPath: String,
                                   idCol: String, vecCol: String): DataFrame = {
    val sess = vectors.sparkSession
    // spread a hollow-split vector scan before the per-row distance kernel
    // (one-row-group parquet collapses the argmin over every corpus vector
    // to ONE task — measured 143.6 s for q_ann_ivf at sf10, Scratch scaladoc)
    val v = graft.core.Scratch.rebalance(vectors)
    val centTable = sess.read.parquet(s"$indexPath/centroids")
    if (centTable.count() <= kernelMaxCells(sess))
      assignCellsKernel(v, readCentroids(sess, indexPath), idCol, vecCol)
    else assignCellsTwoLevel(v, centTable, idCol, vecCol)
  }

  /** Incremental index maintenance: assign `newVectors` against the
    * persisted quantizer and append their (id, cell) rows — searches see the
    * new vectors immediately, no rebuild. CENTROIDS STAY FIXED: the standard
    * maintenance trade (FAISS's add-after-train) — the quantizer slowly
    * drifts from the data distribution, so rebuild when probe recall decays.
    * Caller owns id uniqueness: an id appended twice is two candidate rows
    * (the streaming tier, [[graft.streaming.StreamingAnn]], dedups by id
    * ahead of the sink and absorbs foreachBatch replays).
    */
  def appendToIndex(newVectors: DataFrame, indexPath: String,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit =
    assignWithIndex(newVectors, indexPath, idCol, vecCol)
      .write.mode("append").parquet(s"$indexPath/cells")

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
    * cells per query, rerank candidates in the probed cells by exact cosine.
    * Probe selection is gated like the build: a kernel-sized centroid table
    * rides the probe expression; above [[kernelMaxCells]] probing goes
    * two-level ([[coarseGrouping]]) — coarse-probe first, fine-rank only
    * within the probed coarse groups, O(coarseProbes·√nCells) distance rows
    * per query, all executor-side.
    *
    * The cells scan is pruned to the probed cells with a pushed-down
    * `cell IN (...)` BEFORE the corpus is touched: on a
    * [[compactIndex]]-clustered index the IN filter skips whole row
    * groups, and the corpus join runs against the pruned candidate list
    * (~nProbe/nCells of the index) — never the cells-table-wide
    * id join the pre-round-14 shape started with.
    */
  def ivfTopKFromIndex(embeddings: DataFrame, indexPath: String,
                       queryIds: Seq[Long], k: Int, nProbe: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       corpusFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val sess = embeddings.sparkSession
    require(queryIds.nonEmpty && queryIds.size <= 65536,
      s"IVF search broadcasts the probe table — got ${queryIds.size} queries")
    val queries = embeddings.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val (probes, probedCells) = collectedProbes(queries, indexPath, nProbe)

    val cand = prunedScan(sess.read.parquet(s"$indexPath/cells"),
        "cell", probedCells)
      .join(broadcast(probes), Seq("cell"))       // per-query candidate list
      .where(col(idCol) =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col(idCol))
    cand
      // FILTERED search: the metadata predicate restricts the corpus arm of
      // the candidate fetch (post-probe filter — ranks the probed cells'
      // survivors; queries stay unrestricted). The predicate lands on the
      // embeddings scan via pushdown, so excluded vectors are never read.
      .join(corpusFilter.fold(embeddings)(embeddings.where), idCol)
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("sim", Similarity.cosine(col("qvec"), col(vecCol)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
  }

  /** [[probeTable]] collected to a LOCAL relation plus the sorted distinct
    * probed-cell ids — the shape every index search needs twice: once as
    * the broadcast (query_id, cell) pairing and once as the `cell IN (...)`
    * list pushed into the cells/codes scan. Parameter-sized by contract
    * (nQueries × nProbe, with nQueries ≤ 65536 enforced by every caller),
    * and collected ONCE — the probe computation never runs twice.
    */
  private[llm] def collectedProbes(queries: DataFrame, indexPath: String,
                                   nProbe: Int): (DataFrame, Seq[Long]) = {
    val sess = queries.sparkSession
    import sess.implicits._
    val rows = probeTable(queries, indexPath, nProbe)
      .select(col("query_id").cast("long"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    (rows.toDF("query_id", "cell"), rows.map(_._2).distinct.sorted)
  }

  /** Apply the pushed-down `keyCol IN (values)` prune ONLY while the list
    * stays plan-sized (`graft.ann.maxPushedPruneValues`, default 8192):
    * a 65536-query batch at nProbe 4 would otherwise inline a 256k-literal
    * predicate into the plan (slow to serialize, no better at skipping
    * than the broadcast join it prefilters). Above the cap the scan runs
    * unpruned and the exact broadcast join alone selects candidates —
    * results identical either way, by construction.
    */
  private[llm] def prunedScan(df: DataFrame, keyCol: String,
                              values: Seq[Long]): DataFrame = {
    val cap = df.sparkSession.conf
      .get("graft.ann.maxPushedPruneValues", "8192").toInt
    if (values.size <= cap) df.where(col(keyCol).isInCollection(values))
    else df
  }

  /** Fold append accumulation ([[appendToIndex]] / the streaming tier)
    * back into the built layout: rewrite the cells table range-clustered
    * and sorted by cell, so the search-time `cell IN (probes)` skips whole
    * row groups again and the file count of a forever-appending stream
    * stays bounded. Staging-then-swap via
    * [[graft.core.Compaction.recluster]] — run with writers quiesced
    * ([[graft.streaming.StreamingAnn.appendToIndexes]]'s
    * `compactEveryBatches` runs it inside the serialized foreachBatch).
    * Returns (parquet files before, after).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String): (Int, Int) =
    graft.core.Compaction.recluster(spark, s"$indexPath/cells",
      Seq("cell"), "graft.ann.cellsPartitionBytes")

  /** The (query_id, cell) probe list for a query frame of (query_id, qvec)
    * rows — the cell-pruning half of [[ivfTopKFromIndex]], reusable by any
    * search that ranks candidates differently (e.g. [[Pq.ivfPqTopKFromIndexes]]'
    * ADC). Gated like the build: kernel probes at or below
    * [[kernelMaxCells]], two-level coarse-then-fine above.
    */
  private[llm] def probeTable(queries: DataFrame, indexPath: String,
                              nProbe: Int): DataFrame = {
    val sess = queries.sparkSession
    val centTable = sess.read.parquet(s"$indexPath/centroids")
    if (centTable.count() <= kernelMaxCells(sess)) {
      // nProbe nearest cells per query from one kernel call (ordered by
      // (d², cell) like the oracle's probe window), exploded to join keys
      val centArr = readCentroids(sess, indexPath)
      queries.select(col("query_id"),
        explode(graft.functions.VecExprs.ivfProbes(col("qvec"), centArr, nProbe))
          .as("cell"))
    } else {
      // Two-level probe selection, mirroring [[assignCellsTwoLevel]]: each
      // query probes its coarseProbes nearest coarse seeds with the kernel
      // and fine-ranks ONLY the centroids in those coarse groups —
      // O(coarseProbes·√nCells) distance rows per query instead of the
      // flat O(nCells) centroid scan this branch ran before round 7. The
      // same (d², cell) ordering picks the probes, so wherever the probed
      // coarse groups contain the true nProbe-nearest cells the selection
      // is identical to the flat scan (exhaustive coarseProbes ⇒ exact).
      val (coarseArr, fine) = coarseGrouping(centTable)
      val wp = Window.partitionBy(col("query_id"))
        .orderBy(col("_d2"), col("cell"))
      val qprobed = queries.select(col("query_id"), col("qvec"),
        explode(graft.functions.VecExprs.ivfProbes(col("qvec"), coarseArr,
          coarseProbes(sess))).as("coarse"))
      fine.join(broadcast(qprobed), Seq("coarse"))
        .withColumn("_d2",
          graft.functions.VecExprs.l2Sq(col("qvec"), col("centroid")))
        .withColumn("_r", row_number().over(wp))
        .where(col("_r") <= nProbe)
        .select(col("query_id"), col("cell"))
    }
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
