package graft.streaming

import graft.SparkSpec
import graft.llm.Retrieval

class BatchMarkersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark runs fast very fast"),
    (2L, "spark is a query engine"),
    (3L, "the cat sat on the mat"),
    (4L, "fast fast fast fast fast fast fast fast"),
    (5L, "FAST spark"),
  ).toDF("doc_id", "text")

  test("runOnce: applies once per (stream, batch), replays skip, " +
      "namespaces are independent, markers prune") {
    val root = graft.core.TempDirs.scratch("markers_unit_spec")
    val sidA = BatchMarkers.streamId("/ckpt/a")
    val sidB = BatchMarkers.streamId("/ckpt/b")
    var runs = 0
    assert(BatchMarkers.runOnce(spark, root, sidA, 0L) { runs += 1 })
    assert(!BatchMarkers.runOnce(spark, root, sidA, 0L) { runs += 1 },
      "same (stream, batch) must skip")
    assert(runs == 1)
    // a DIFFERENT stream's batch 0 is new data, not a replay
    assert(BatchMarkers.runOnce(spark, root, sidB, 0L) { runs += 1 })
    assert(runs == 2)
    assert(BatchMarkers.appliedBatches(spark, root, sidA) == Seq(0L))
    // pruning: only the most recent window of markers is retained
    (1L to 200L).foreach(i => BatchMarkers.runOnce(spark, root, sidA, i)(()))
    val kept = BatchMarkers.appliedBatches(spark, root, sidA)
    assert(kept.last == 200L && kept.head >= 72L && kept.size <= 129,
      s"marker dir must stay bounded, kept ${kept.size} [${kept.head}..${kept.last}]")
  }

  test("a replayed micro-batch (commit lost, offsets kept) does not " +
      "double-count the BM25 index") {
    val idx = graft.core.TempDirs.scratch("markers_replay_idx")
    val ckpt = graft.core.TempDirs.scratch("markers_replay_ckpt")
    val srcDir = graft.core.TempDirs.scratch("markers_replay_src")
    Retrieval.buildIndex(docs.where($"doc_id" <= 3), idx)
    docs.where($"doc_id" > 3).write.parquet(srcDir)
    def stream() = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    // dedupKey = None: the replayed batch would re-commit the
    // dropDuplicates state store, which Spark 4.1's state-commit
    // validation rejects under this synthetic commit-file surgery; the
    // marker protocol (what this test pins) is orthogonal to that state
    val q1 = StreamingRetrieval.appendPostings(stream(), idx,
      checkpoint = Some(ckpt), dedupKey = None)
    q1.awaitTermination(); q1.stop()
    // the checkpoint's active-run registration clears asynchronously after
    // stop; the restart below reuses the same checkpoint
    val deadline = System.nanoTime() + 10000000000L
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    val once = spark.read.parquet(s"$idx/postings").count()

    // simulate the crash window the markers exist for: the append's
    // parquet commit landed but the checkpoint's batch commit did not —
    // deleting commits/<latest> makes the restarted stream re-deliver
    // that batchId (at-least-once), and the marker must absorb it
    val commits = new java.io.File(s"$ckpt/commits")
    val latest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(latest.delete(), s"could not delete ${latest}")
    // the local checksum fs keeps a .N.crc sidecar; left behind it makes
    // the restarted query's commit-log rename fail
    new java.io.File(commits, s".${latest.getName}.crc").delete(): Unit
    val q2 = StreamingRetrieval.appendPostings(stream(), idx,
      checkpoint = Some(ckpt), dedupKey = None)
    q2.awaitTermination(); q2.stop()
    assert(spark.read.parquet(s"$idx/postings").count() == once,
      "the replayed batch must be skipped, not re-appended")
    val queries = Seq(0L -> "spark fast", 1L -> "engine")
    assert(Retrieval.bm25TopKFromIndex(spark, idx, queries, k = 10)
      .collect().map(_.toSeq).toSet ==
      Retrieval.bm25TopK(docs, queries, k = 10).collect().map(_.toSeq).toSet,
      "post-replay ranking must equal the batch full-corpus build")
  }

  test("a FRESH checkpoint against an existing index appends (no false " +
      "skip from colliding batchIds)") {
    val idx = graft.core.TempDirs.scratch("markers_fresh_idx")
    Retrieval.buildIndex(docs.where($"doc_id" <= 3), idx)
    val src1 = graft.core.TempDirs.scratch("markers_fresh_src1")
    docs.where($"doc_id" === 4).write.parquet(src1)
    def stream(dir: String) = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q1 = StreamingRetrieval.appendPostings(stream(src1), idx,
      checkpoint = Some(graft.core.TempDirs.scratch("markers_fresh_ck1")))
    q1.awaitTermination(); q1.stop()
    // a second, INDEPENDENT stream starts its own batchIds at 0 — its
    // batches are new data and must not be skipped
    val src2 = graft.core.TempDirs.scratch("markers_fresh_src2")
    docs.where($"doc_id" === 5).write.parquet(src2)
    val q2 = StreamingRetrieval.appendPostings(stream(src2), idx,
      checkpoint = Some(graft.core.TempDirs.scratch("markers_fresh_ck2")))
    q2.awaitTermination(); q2.stop()
    val queries = Seq(0L -> "spark fast", 1L -> "engine")
    assert(Retrieval.bm25TopKFromIndex(spark, idx, queries, k = 10)
      .collect().map(_.toSeq).toSet ==
      Retrieval.bm25TopK(docs, queries, k = 10).collect().map(_.toSeq).toSet,
      "both independent streams' batches must land")
  }
}
