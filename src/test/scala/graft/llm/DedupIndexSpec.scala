package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted dedup-index lifecycle must be INVISIBLE in the result:
  * build → append → compact → query has to reproduce the from-scratch
  * batch near-dup pairs bit-for-bit (est_jaccard included), and the
  * delta probe must equal the delta-touching slice of the full join.
  */
class DedupIndexSpec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  private def asSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("build + append + compact reproduces the batch near-dup pairs exactly") {
    val idx = graft.core.TempDirs.scratch("dedup_idx_spec")
    DedupIndex.buildIndex(docs.where(col("doc_id") % 3 === 0), idx)
    DedupIndex.appendToIndex(docs.where(col("doc_id") % 3 === 1), idx)
    DedupIndex.appendToIndex(docs.where(col("doc_id") % 3 === 2), idx)
    val before = asSet(DedupIndex.pairsFromIndex(spark, idx))
    val (nBefore, nAfter) = DedupIndex.compactIndex(spark, idx)
    assert(nAfter < nBefore, s"compaction must fold files: $nBefore -> $nAfter")
    val after = asSet(DedupIndex.pairsFromIndex(spark, idx))
    assert(after == before, "compaction changed the query result")
    val batch = asSet(Dedup.nearDupPairs(docs))
    assert(after == batch, "indexed pairs diverge from the batch plan")
    assert(batch.nonEmpty) // fixture sanity: the comparison is non-vacuous
  }

  test("queryIndex(delta) equals the delta-touching slice of the full join") {
    val idx = graft.core.TempDirs.scratch("dedup_idx_delta")
    val corpus = docs.where(col("doc_id") % 4 =!= 0)
    val delta = docs.where(col("doc_id") % 4 === 0)
    DedupIndex.buildIndex(corpus, idx)
    val probe = asSet(DedupIndex.queryIndex(delta, idx))
    DedupIndex.appendToIndex(delta, idx)
    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = asSet(DedupIndex.pairsFromIndex(spark, idx))
      .filter(p => deltaIds(p._1) || deltaIds(p._2))
    assert(probe == expected)
  }

  test("append with a mismatched k fails loudly") {
    val idx = graft.core.TempDirs.scratch("dedup_idx_k")
    DedupIndex.buildIndex(docs.limit(50), idx, k = 32)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.appendToIndex(docs.limit(10), idx, k = 16)
    }
    assert(e.getMessage.contains("k=16"))
  }

  test("streamed appendDedupIndex with in-stream compaction equals the batch pairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = graft.core.TempDirs.scratch("dedup_idx_stream")
    DedupIndex.buildIndex(docs.where(col("doc_id") % 2 === 0), idx)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingCorpus.appendDedupIndex(
      input.toDF().toDF("doc_id", "text"), idx,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      compactEveryBatches = Some(2))
    try {
      // four genuine micro-batches, compaction fires after #2 and #4
      val rest = docs.where(col("doc_id") % 2 === 1)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      rest.grouped(math.max(1, rest.length / 4 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = asSet(DedupIndex.pairsFromIndex(spark, idx))
    val batch = asSet(Dedup.nearDupPairs(docs))
    assert(streamed == batch)
  }

  test("the index table is one atomic layout: both row kinds in every commit") {
    val idx = graft.core.TempDirs.scratch("dedup_idx_atomic")
    DedupIndex.buildIndex(docs.limit(100), idx)
    val t = spark.read.parquet(s"$idx/sigs")
    val banded = t.where(col("band").isNotNull && col("doc_id").isNotNull).count()
    val sigRows = t.where(col("band").isNull).count()
    assert(sigRows == 100L)
    assert(banded == 100L * 8) // bands per doc
    // the meta row rides the same commit: (id NULL, band = n, band_hash = bands)
    val meta = t.where(col("doc_id").isNull).collect()
    assert(meta.length == 1)
    assert(meta.head.getInt(1) == 3 && meta.head.getLong(2) == 8L)
  }

  test("append/query with mismatched n or bands fails loudly; compaction " +
      "folds meta rows to one") {
    val idx = graft.core.TempDirs.scratch("dedup_idx_meta")
    DedupIndex.buildIndex(docs.limit(50), idx, n = 3, bands = 8)
    DedupIndex.appendToIndex(docs.limit(60).where(col("doc_id") > 50), idx)
    assert(spark.read.parquet(s"$idx/sigs")
      .where(col("doc_id").isNull).count() == 2L, "one meta row per commit")
    val eN = intercept[IllegalArgumentException] {
      DedupIndex.appendToIndex(docs.limit(10), idx, n = 5)
    }
    assert(eN.getMessage.contains("n=5"))
    val eB = intercept[IllegalArgumentException] {
      DedupIndex.queryIndex(docs.limit(10), idx, bands = 4)
    }
    assert(eB.getMessage.contains("bands=4"))
    DedupIndex.compactIndex(spark, idx)
    val meta = spark.read.parquet(s"$idx/sigs")
      .where(col("doc_id").isNull).collect()
    assert(meta.length == 1, "compaction must fold the per-commit meta rows")
    assert(meta.head.getInt(1) == 3 && meta.head.getLong(2) == 8L)
    // matched parameters still work after compaction
    assert(DedupIndex.pairsFromIndex(spark, idx).columns
      .sameElements(Array("id_a", "id_b", "est_jaccard")))
  }

  test("per-JVM params cache refreshes on an in-JVM rebuild") {
    val idx = graft.core.TempDirs.scratch("dedup_idx_cache")
    DedupIndex.buildIndex(docs.limit(30), idx, n = 3, k = 32, bands = 8)
    // seed the cache through a validated append
    DedupIndex.appendToIndex(
      docs.where(col("doc_id").between(31, 60)), idx)
    // REBUILD the same path with different params: the cache entry must
    // refresh from the write, so the NEW params validate and the OLD
    // params fail — a stale entry would invert both
    DedupIndex.buildIndex(docs.limit(30), idx, n = 4, k = 16, bands = 4)
    DedupIndex.appendToIndex(
      docs.where(col("doc_id").between(31, 60)), idx, n = 4, k = 16, bands = 4)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.appendToIndex(docs.limit(10), idx) // stale (3, 32, 8)
    }
    assert(e.getMessage.contains("k=32") && e.getMessage.contains("k=16"))
  }
}
