package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Incremental ANN index maintenance: appends land in the persisted
  * cells/codes tables against the FIXED quantizer/codebooks, searches see
  * them without a rebuild, and the streaming tier absorbs replays.
  */
class AnnAppendSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def vec(i: Int): Seq[Float] =
    (0 until dim).map(d => (((i * 131 + d * 57) % 251) / 251.0f))

  // base corpus 0..29; the append batch 30..39 plants a clone of vec 0 at 39
  private lazy val base: DataFrame =
    (0 until 30).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
  private lazy val extra: DataFrame =
    ((30 until 39).map(i => (i.toLong, vec(i))) :+ (39L, vec(0)))
      .toDF("vec_id", "embedding")
  private lazy val all: DataFrame = base.union(extra)

  test("Ivf.appendToIndex: appended clone is searchable, centroids untouched") {
    val path = graft.core.TempDirs.scratch("ivf_append")
    Ivf.buildIndexSeeded(base, path, nCells = 8)
    val centBefore = spark.read.parquet(s"$path/centroids").collect().toSet
    Ivf.appendToIndex(extra, path)
    assert(spark.read.parquet(s"$path/cells").count() == 40)
    assert(spark.read.parquet(s"$path/centroids").collect().toSet == centBefore)
    // the clone lands in vec 0's cell (same vector, same argmin centroid)
    val got = Ivf.ivfTopKFromIndex(all, path, Seq(0L), k = 1, nProbe = 1)
      .collect().head
    assert(got.getAs[Long]("neighbor_id") == 39L)
  }

  test("Pq.appendToIndex: appended rows encode with the persisted books") {
    val path = graft.core.TempDirs.scratch("pq_append")
    Pq.buildIndex(base, path, m = 4, ksub = 4)
    Pq.appendToIndex(extra, path)
    val codes = spark.read.parquet(s"$path/codes").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(codes.size == 40)
    assert(codes(39L) == codes(0L)) // clone quantizes identically
    // rerank over the appended index pins the clone first
    val got = Pq.adcTopKFromIndex(all, path, Seq(0L), k = 1, nRerank = 8)
      .collect().head
    assert(got.getAs[Long]("neighbor_id") == 39L)
  }

  test("Ivf.compactIndex folds appends: fewer files, ranking identical, " +
      "cell IN pushed to the cells scan") {
    val path = graft.core.TempDirs.scratch("ivf_compact")
    Ivf.buildIndexSeeded(base, path, nCells = 8)
    // ten one-row appends: the worst-case file accumulation shape
    extra.collect().foreach { r =>
      Ivf.appendToIndex(
        Seq((r.getLong(0), r.getSeq[Float](1))).toDF("vec_id", "embedding"),
        path)
    }
    val before = Ivf.ivfTopKFromIndex(all, path, Seq(0L, 5L), k = 3, nProbe = 2)
      .collect().map(_.toSeq).toSet
    val (nBefore, nAfter) = Ivf.compactIndex(spark, path)
    assert(nAfter < nBefore, s"compaction must shrink files ($nBefore -> $nAfter)")
    assert(spark.read.parquet(s"$path/cells").count() == 40,
      "compaction is row-preserving")
    val after = Ivf.ivfTopKFromIndex(all, path, Seq(0L, 5L), k = 3, nProbe = 2)
    assert(after.collect().map(_.toSeq).toSet == before,
      "compaction must not change the ranking")
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(cell"),
      s"cells scan must carry a pushed cell IN (...):\n$plan")
  }

  test("IN-prune cap: an oversized probe list skips the pushed filter, " +
      "results identical") {
    val path = graft.core.TempDirs.scratch("ivf_prune_cap")
    Ivf.buildIndexSeeded(all, path, nCells = 8)
    val withPrune = Ivf.ivfTopKFromIndex(all, path, Seq(0L, 5L), k = 3, nProbe = 2)
    assert(withPrune.queryExecution.executedPlan.toString.contains("In(cell"))
    spark.conf.set("graft.ann.maxPushedPruneValues", "0")
    try {
      val noPrune = Ivf.ivfTopKFromIndex(all, path, Seq(0L, 5L), k = 3, nProbe = 2)
      assert(!noPrune.queryExecution.executedPlan.toString.contains("In(cell"),
        "above the cap the scan must run unpruned (no giant literal list)")
      assert(noPrune.collect().map(_.toSeq).toSet ==
        withPrune.collect().map(_.toSeq).toSet,
        "the prune is a pure prefilter — results must not depend on it")
    } finally spark.conf.unset("graft.ann.maxPushedPruneValues")
  }

  test("Pq.compactIndex clusters flat codes by id and residual codes by " +
      "cell — searches identical, residual scan pushes cell IN") {
    val flat = graft.core.TempDirs.scratch("pq_compact_flat")
    Pq.buildIndex(base, flat, m = 4, ksub = 4)
    extra.collect().foreach { r =>
      Pq.appendToIndex(
        Seq((r.getLong(0), r.getSeq[Float](1))).toDF("vec_id", "embedding"),
        flat)
    }
    val flatBefore = Pq.adcTopKFromIndex(all, flat, Seq(0L), k = 3, nRerank = 8)
      .collect().map(_.toSeq).toSet
    val (fb, fa) = Pq.compactIndex(spark, flat)
    assert(fa < fb, s"flat codes must shrink ($fb -> $fa)")
    assert(Pq.adcTopKFromIndex(all, flat, Seq(0L), k = 3, nRerank = 8)
      .collect().map(_.toSeq).toSet == flatBefore)

    val ivfPath = graft.core.TempDirs.scratch("pqr_compact_ivf")
    val pqPath = graft.core.TempDirs.scratch("pqr_compact_pq")
    Ivf.buildIndexSeeded(all, ivfPath, nCells = 8)
    Pq.buildResidualIndex(all, ivfPath, pqPath, m = 4, ksub = 4)
    val resBefore = Pq.ivfPqResidualTopKFromIndexes(all, ivfPath, pqPath,
      Seq(0L), k = 3, nProbe = 4).collect().map(_.toSeq).toSet
    Pq.compactIndex(spark, pqPath): Unit // residual codes carry cell
    val res = Pq.ivfPqResidualTopKFromIndexes(all, ivfPath, pqPath,
      Seq(0L), k = 3, nProbe = 4)
    assert(res.collect().map(_.toSeq).toSet == resBefore)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("In(cell"),
      s"residual codes scan must carry a pushed cell IN (...):\n$plan")
  }

  test("StreamingAnn appends each arriving batch once — replays are absorbed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ivfPath = graft.core.TempDirs.scratch("ivf_stream_append")
    val pqPath = graft.core.TempDirs.scratch("pq_stream_append")
    val sqPath = graft.core.TempDirs.scratch("sq_stream_append")
    Ivf.buildIndexSeeded(base, ivfPath, nCells = 8)
    Pq.buildIndex(base, pqPath, m = 4, ksub = 4)
    Sq.buildIndex(base, sqPath)

    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    val rows = ((30 until 39).map(i => (i.toLong, vec(i))) :+ (39L, vec(0)))
    val q = graft.streaming.StreamingAnn.appendToIndexes(stream,
      ivfPath = Some(ivfPath), pqPath = Some(pqPath), sqPath = Some(sqPath),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // the same rows arriving again (source replay) must not re-append
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(spark.read.parquet(s"$ivfPath/cells").count() == 40)
    assert(spark.read.parquet(s"$pqPath/codes").count() == 40)
    assert(spark.read.parquet(s"$sqPath/codes").count() == 40)
    // the streamed-in clone shares vec 0's SQ codes (fixed bounds encode)
    val sqCodes = spark.read.parquet(s"$sqPath/codes").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(sqCodes(39L) == sqCodes(0L))
    // composed search over the streamed-in index finds the streamed clone
    val got = Pq.ivfPqTopKFromIndexes(all, ivfPath, pqPath, Seq(0L),
        k = 1, nProbe = 8, nRerank = 8)
      .collect().head
    assert(got.getAs[Long]("neighbor_id") == 39L)
  }

  test("compactSignatures folds a streamed signature table: bounded files, " +
      "search equals batch, bucket IN pushed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val sigPath = graft.core.TempDirs.scratch("lsh_sig_compact")
    Similarity.lshSignatures(base, bits = 4, tables = 4, dim = dim)
      .write.parquet(sigPath)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.StreamingAnn.appendSignatures(
      input.toDF().toDF("vec_id", "embedding"), sigPath,
      bits = 4, tables = 4, dim = dim,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      compactEveryBatches = Some(1))
    try {
      ((30 until 39).map(i => (i.toLong, vec(i))) :+ (39L, vec(0))).foreach { r =>
        input.addData(r)
        q.processAllAvailable()
      }
    } finally q.stop()
    val sigs = spark.read.parquet(sigPath)
    assert(sigs.count() == 160L) // 40 vectors x 4 tables
    val nFiles = graft.core.Compaction.parquetFileCount(spark, sigPath)
    assert(nFiles <= spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"per-batch compaction must keep the table bounded, got $nFiles files")
    // hyperplanes are pure functions of (tables, bits, dim): the streamed
    // table ranks exactly like a one-shot batch build over the union
    val streamed = Similarity.lshTopKFromSignatures(sigs, Seq(0L, 7L), k = 3)
    val batch = Similarity.lshTopK(all, Seq(0L, 7L), k = 3,
      bits = 4, tables = 4, dim = dim)
    assert(streamed.collect().map(_.toSeq).toSet ==
      batch.collect().map(_.toSeq).toSet)
    val plan = streamed.queryExecution.executedPlan.toString
    assert(plan.contains("In(bucket"),
      s"corpus-side signature scan must push bucket IN (...):\n$plan")
  }

  test("StreamingAnn with compactEveryBatches bounds the file count of a " +
      "per-row stream — search equals the batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ivfPath = graft.core.TempDirs.scratch("ivf_stream_compact")
    val sqPath = graft.core.TempDirs.scratch("sq_stream_compact")
    Ivf.buildIndexSeeded(base, ivfPath, nCells = 8)
    Sq.buildIndex(base, sqPath)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.StreamingAnn.appendToIndexes(
      input.toDF().toDF("vec_id", "embedding"),
      ivfPath = Some(ivfPath), sqPath = Some(sqPath),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      compactEveryBatches = Some(1))
    try {
      // one row per micro-batch: ten appends, each followed by a compact
      ((30 until 39).map(i => (i.toLong, vec(i))) :+ (39L, vec(0))).foreach { r =>
        input.addData(r)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(spark.read.parquet(s"$ivfPath/cells").count() == 40)
    assert(spark.read.parquet(s"$sqPath/codes").count() == 40)
    val nCells = graft.core.Compaction.parquetFileCount(spark, s"$ivfPath/cells")
    assert(nCells <= spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"per-batch compaction must keep the cells table at built width, got $nCells files")
    val got = Ivf.ivfTopKFromIndex(all, ivfPath, Seq(0L), k = 1, nProbe = 1)
      .collect().head
    assert(got.getAs[Long]("neighbor_id") == 39L)
  }
}
