package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // two well-separated clusters + a clone of vec 0
    val a = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(d => (10.0 + math.sin(i * 13.0 + d)).toFloat)))
    val b = (20L until 40L).map(i =>
      (i, Array.tabulate(8)(d => (-10.0 + math.cos(i * 7.0 + d)).toFloat)))
    (a ++ b :+ (99L, a.head._2)).toDF("vec_id", "embedding")
  }

  private def tmp(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_test_${tag}_" +
      java.util.UUID.randomUUID().toString

  test("buildIndexKMeans persists cells + centroids; every vector assigned") {
    val path = tmp("ivf_kmeans")
    Ivf.buildIndexKMeans(corpus, path, nCells = 4)
    val cells = spark.read.parquet(s"$path/cells")
    val cents = spark.read.parquet(s"$path/centroids")
    assert(cents.count() == 4)
    assert(cells.count() == corpus.count())
    assert(cells.where(col("cell").isNull).count() == 0)
    assert(cells.select("cell").distinct().count() <= 4)
  }

  test("ivfTopKFromIndex on a prebuilt KMeans index finds the clone at rank 1") {
    val path = tmp("ivf_query")
    Ivf.buildIndexKMeans(corpus, path, nCells = 4)
    val got = Ivf.ivfTopKFromIndex(corpus, path, Seq(0L), k = 5, nProbe = 2)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toMap
    assert(got.get(99L).contains(1L))
  }

  test("seeded ivfTopK finds the identical clone on an arbitrary id space") {
    // ids shifted far beyond any fixture range: seeds are corpus-derived, so
    // the quantizer must work with no assumptions about which ids exist.
    // The clone's vector equals the query's, so it lands in the query's cell
    // under ANY seed placement and nProbe=1 still reaches it.
    val shifted = corpus.withColumn("vec_id", col("vec_id") + 5000000L)
    val got = Ivf.ivfTopK(shifted, Seq(5000000L), k = 5, nCells = 2, nProbe = 1)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toMap
    assert(got.get(5000099L).contains(1L))
  }

  test("seedTable picks nCells corpus ids, cells numbered 0..n-1") {
    val shifted = corpus.withColumn("vec_id", col("vec_id") + 5000000L)
    val seeds = Ivf.seedTable(shifted, 4).collect()
    assert(seeds.length == 4)
    assert(seeds.map(_.getAs[Long]("cell")).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(seeds.map(_.getAs[Long]("vec_id")).forall(_ >= 5000000L))
  }

  test("derivedNCells holds cell SIZE (not count) constant as the corpus grows") {
    assert(Ivf.derivedNCells(500) == 16)    // floor
    assert(Ivf.derivedNCells(5000) == 79)   // ceil(5000/64)
    assert(Ivf.derivedNCells(1000000) == 15625)
  }

  /** Clustered corpus for the scale-gate tests: `nClusters` well-separated
    * tight clusters (inter-center distance O(100), intra-cluster jitter
    * ≤0.1) — the regime where the two-level quantizer's probed coarse groups
    * contain the true nearest centroid, so both assignment paths agree
    * exactly. Deterministic (pure trig), so agreement is a stable assertion.
    */
  private def clustered(nClusters: Int, perCluster: Int, dim: Int) = {
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val id = (c * perCluster + i).toLong
      (id, Array.tabulate(dim)(d =>
        (100.0 * math.sin(c * 31.0 + d * 7.0) + 0.1 * math.sin(id * 13.0 + d)).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("nCells above the gate: two-level build matches the flat kernel, " +
       "no driver centroid materialization") {
    val path = tmp("ivf_twolevel")
    val corpus = clustered(nClusters = 84, perCluster = 100, dim = 8)
    // 4200 > graft.ivf.kernelMaxCells default 4096 -> two-level path
    Ivf.buildIndexSeeded(corpus, path, nCells = 4200)
    // the kernel-path companion is hard-gated off at this size: the build
    // could not have collected the centroid table to the driver
    val ex = intercept[IllegalArgumentException] {
      Ivf.readCentroids(spark, path)
    }
    assert(ex.getMessage.contains("kernelMaxCells"))
    // flat reference assignment, computed test-side from the persisted table
    val centArr = spark.read.parquet(s"$path/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)
    assert(centArr.length == 4200)
    val flat = Ivf.assignCellsKernel(corpus, centArr, "vec_id", "embedding")
      .as[(Long, Long)].collect().toMap
    val twoLevel = spark.read.parquet(s"$path/cells")
      .as[(Long, Long)].collect().toMap
    assert(twoLevel.size == corpus.count())
    assert(twoLevel == flat, "two-level assignment must equal the flat argmin " +
      "on a clustered corpus")
  }

  test("seedTable numbering is identical on the window and zipWithIndex paths") {
    // above-gate nCells=8 on a 41-row corpus prefilters to ~78% of the rows
    // (margin 4) before the sort — the count-verified bottom-k path
    val shifted = corpus.withColumn("vec_id", col("vec_id") + 5000000L)
    val viaWindow = Ivf.seedTable(shifted, 8).as[(Long, Long)].collect().toSet
    spark.conf.set("graft.ivf.kernelMaxCells", "4")
    try {
      val viaZip = Ivf.seedTable(shifted, 8).as[(Long, Long)].collect().toSet
      assert(viaZip == viaWindow)
      // full-sort fallback (nCells >= corpus: the prefilter can't help):
      // every id gets a cell, numbering still matches the window ordering
      val all = Ivf.seedTable(shifted, 41).as[(Long, Long)].collect()
      assert(all.length == 41)
      assert(all.map(_._2).sorted.toSeq == (0L until 41L))
      assert(all.toSet.intersect(viaWindow).size == viaWindow.size ||
        viaWindow.subsetOf(all.toSet))
    } finally spark.conf.unset("graft.ivf.kernelMaxCells")
  }

  test("plan guard: kernel assignment shuffle-free; two-level assignment and " +
       "probe never hold the fine table on the driver") {
    // parquet-backed corpus: a purely local relation would constant-fold the
    // whole assignment into a LocalTableScan and hide the plan under test
    val src = tmp("ivf_planguard_src")
    corpus.write.parquet(src)
    val corpusP = spark.read.parquet(src)
    // kernel path: a narrow codegen'd map — any Exchange in this plan is a
    // regression against the r5 gate design
    val cents = Array.tabulate(4)(c => Array.tabulate(8)(d => c * 10.0 + d))
    val kern = Ivf.assignCellsKernel(corpusP, cents, "vec_id", "embedding")
    kern.collect()
    val kplan = kern.queryExecution.executedPlan.toString
    assert(!kplan.contains("Exchange"),
      s"kernel assignment must stay a shuffle-free narrow map:\n$kplan")
    assert(kplan.contains("ivf_cell"), kplan)

    // two-level path: fine centroids stay distributed — the plan must join
    // them (vec_l2sq inside the join) and pre-combine the per-row min as a
    // hash aggregate; the only kernel objects riding the plan are the
    // coarse-sized ones (gated ≤ kernelMaxCells inside coarseGrouping)
    val centSrc = tmp("ivf_planguard_cent")
    (0L until 20L).map(c => (c, Array.tabulate(8)(d => c * 10.0 + d)))
      .toDF("cell", "centroid").write.parquet(centSrc)
    val centDf = spark.read.parquet(centSrc)
    val two = Ivf.assignCellsTwoLevel(corpusP, centDf, "vec_id", "embedding")
    two.collect()
    val tplan = two.queryExecution.executedPlan.toString
    assert(tplan.contains("vec_l2sq"), tplan)
    // map-side pre-combine: the shuffle carries one (id, best) pair per row,
    // never the candidate fan-out (struct-min plans as SortAggregate)
    assert(tplan.contains("partial_min"), tplan)
    assert(tplan.contains("Join"), tplan)

    // above-gate probe selection: coarse-pruned equi-join, never the flat
    // per-query centroid scan (no cartesian/nested-loop shapes)
    spark.conf.set("graft.ivf.kernelMaxCells", "16")
    try {
      val path = tmp("ivf_planguard")
      val corpusK = clustered(nClusters = 12, perCluster = 30, dim = 8)
      Ivf.buildIndexSeeded(corpusK, path, nCells = 24)
      val got = Ivf.ivfTopKFromIndex(corpusK, path, Seq(0L), k = 3, nProbe = 2)
      got.collect()
      val qplan = got.queryExecution.executedPlan.toString
      assert(!qplan.contains("CartesianProduct") &&
             !qplan.contains("BroadcastNestedLoopJoin"),
        s"search must stay equi-join shaped:\n$qplan")
      // probes are collected ahead of the search since round 14, so the
      // search plan carries their result as a pushed cell IN (...) on the
      // cells scan instead of the probe expression itself
      assert(qplan.contains("In(cell"), qplan)
      // the probe-selection job keeps the coarse-pruned equi-join shape:
      // the kernel expression probes coarse seeds, never a flat per-query
      // scan of the fine table (no cartesian/nested-loop shapes)
      val queries = corpusK.where($"vec_id" === 0L)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      val pplan = Ivf.probeTable(queries, path, 2)
        .queryExecution.executedPlan.toString
      assert(pplan.contains("ivf_probes"), pplan)
      assert(!pplan.contains("CartesianProduct") &&
             !pplan.contains("BroadcastNestedLoopJoin"),
        s"above-gate probe must be the coarse-pruned equi-join:\n$pplan")
    } finally spark.conf.unset("graft.ivf.kernelMaxCells")
  }

  test("KMeans quality path: same persisted layout, contiguous centroids, " +
       "recall on a clustered corpus >= the seeded quantizer's") {
    // KMeans isn't oracle-expressible (iterative, RNG-initialized), so this
    // spec is its quality gate: on a corpus whose structure matches the cell
    // count, learned centroids must probe at least as well as hash-medoids.
    val corpusK = clustered(nClusters = 12, perCluster = 30, dim = 8)
    val queries = Seq(0L, 35L, 95L, 170L, 290L)
    val k = 5
    val truth = Similarity.bruteForceTopK(corpusK, queries, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(indexPath: String): Double = {
      val got = Ivf.ivfTopKFromIndex(corpusK, indexPath, queries, k, nProbe = 2)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      queries.map(q => truth(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble
        / truth(q).size).sum / queries.size
    }
    val kmPath = tmp("ivf_km_quality"); val seedPath = tmp("ivf_seed_quality")
    Ivf.buildIndexKMeans(corpusK, kmPath, nCells = 12)
    Ivf.buildIndexSeeded(corpusK, seedPath, nCells = 12)
    // identical two-table layout, and the kernel path's contiguity guard
    // accepts the KMeans centroid table
    val kmCents = Ivf.readCentroids(spark, kmPath)
    assert(kmCents.length == 12 && kmCents.forall(_.length == 8))
    assert(spark.read.parquet(s"$kmPath/cells").columns.toSeq ==
      spark.read.parquet(s"$seedPath/cells").columns.toSeq)
    val (rKm, rSeed) = (recall(kmPath), recall(seedPath))
    assert(rKm >= rSeed,
      s"KMeans recall $rKm must be >= seeded-medoid recall $rSeed")
    assert(rKm > 0.9, s"clustered corpus with cluster-aligned cells: $rKm")
  }

  test("lowered gate forces two-level end-to-end: search still finds the clone") {
    // 16 is the smallest valid gate (coarseK floors at 16)
    spark.conf.set("graft.ivf.kernelMaxCells", "16")
    try {
      val corpus9 = clustered(nClusters = 12, perCluster = 30, dim = 8)
        .unionAll(Seq((9999L,
          Array.tabulate(8)(d => (100.0 * math.sin(0 * 31.0 + d * 7.0)
            + 0.1 * math.sin(0 * 13.0 + d)).toFloat))).toDF("vec_id", "embedding"))
      val got = Ivf.ivfTopK(corpus9, Seq(0L), k = 3, nCells = 24, nProbe = 2)
        .select("neighbor_id", "rank").as[(Long, Long)].collect().toMap
      assert(got.get(9999L).contains(1L), "identical clone must rank 1 through " +
        "the two-level build + distributed probe path")
    } finally spark.conf.unset("graft.ivf.kernelMaxCells")
  }
}

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("semanticDedup drops the clone, keeps distinct vectors") {
    val a = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(d => (10.0 + math.sin(i * 13.0 + d)).toFloat)))
    val corpus = (a :+ (99L, a.head._2)).toDF("vec_id", "embedding")
    val survivors = Dedup.semanticDedup(corpus, minCosine = 0.999999, nCells = 2)
      .as[Long].collect().toSet
    assert(!survivors.contains(99L), "identical clone must be dropped")
    assert(survivors.contains(0L), "the lower id of the pair survives")
    assert((0L until 20L).forall(survivors.contains))
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sampling is deterministic, rate-respecting and stratified") {
    val docs = (1L to 2000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val s1 = Sampling.stratifiedSample(docs, "source",
      rates = Map("src0" -> 0.8, "src1" -> 0.1), defaultRate = 0.5)
    val s2 = Sampling.stratifiedSample(docs, "source",
      rates = Map("src0" -> 0.8, "src1" -> 0.1), defaultRate = 0.5)
    val r1 = s1.as[(Long, String)].collect().toSet
    assert(r1 == s2.as[(Long, String)].collect().toSet) // reproducible
    val bySrc = r1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(math.abs(bySrc("src0") - 400) < 60)   // 80% of 500
    assert(math.abs(bySrc.getOrElse("src1", 0) - 50) < 30) // 10% of 500
    assert(math.abs(bySrc("src2") + bySrc("src3") - 500) < 80) // default 50%
    // uniform sampler: rate 0 and 1 are exact
    assert(Sampling.hashSample(docs, 0.0).count() == 0)
    assert(Sampling.hashSample(docs, 1.0).count() == 2000)
  }
}

class SourcesSpec extends SparkSpec {
  import graft.sources.Sources

  test("fileInfo reports trace and field counts") {
    val r = Sources.fileInfo(spark, "/root/testdata/sf0.001", "lineitem").collect().head
    assert(r.getAs[Long]("n_traces") == 6000L)
    assert(r.getAs[Int]("n_fields") == 11)
  }

  test("headerScan prunes to the projected fields") {
    val df = Sources.headerScan(spark, "/root/testdata/sf0.001", "lineitem",
      Seq("l_orderkey", "l_linenumber"))
    assert(df.columns.toSeq == Seq("l_orderkey", "l_linenumber"))
    // column pruning visible in the optimized scan schema
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("l_orderkey") && !plan.contains("l_extendedprice"))
  }

  test("promoteIbm32 casts declared fields to float") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    val out = Sources.promoteIbm32(df, Seq("b", "missing"))
    assert(out.schema("b").dataType.typeName == "float")
    assert(out.schema("a").dataType.typeName == "integer")
  }
}
