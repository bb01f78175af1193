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
}
