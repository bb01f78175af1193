package graft.llm

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark runs fast very fast"),
    (2L, "spark is a query engine"),
    (3L, "the cat sat on the mat"),
    (4L, "fast fast fast fast fast fast fast fast"),
    (5L, "FAST spark"), // case-folds
  ).toDF("doc_id", "text")

  test("index build leaves no scratch files behind (scoped stage)") {
    // writeIndex runs per micro-batch on a stream: an exit-hook-lifetime
    // scratch dir per batch is unbounded disk growth on a long stream
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def scratchDirs() = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("graft_scratch_bm25_widx_")).toSet
    val before = scratchDirs()
    Retrieval.buildIndex(docs, graft.core.TempDirs.scratch("bm25_clean_spec"))
    assert(scratchDirs() == before,
      "the bm25_widx stage must be deleted when writeIndex returns")
  }

  test("docs sharing no query term never surface") {
    val out = Retrieval.bm25TopK(docs, Seq(0L -> "spark fast"), k = 10)
    assert(!out.collect().map(_.getAs[Long]("doc_id")).contains(3L))
  }

  test("a doc matching both terms outranks equal-length single-term docs") {
    val out = Retrieval.bm25TopK(docs, Seq(0L -> "spark engine"), k = 10)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id"))
    // doc 2 has both terms; docs 1 and 5 have only "spark"
    assert(out.head == 2L)
  }

  test("tf saturates: 8× repetition does not scale the score 8×") {
    val out = Retrieval.bm25TopK(docs, Seq(0L -> "fast"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    // doc 4 (tf=8, dl=8) vs doc 5 (tf=1, dl=2): more weight, but bounded
    assert(out(4L) > out(5L))
    assert(out(4L) < out(5L) * 8.0)
  }

  test("matching is case-insensitive on both sides") {
    val out = Retrieval.bm25TopK(docs, Seq(0L -> "SPARK"), k = 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(1L, 2L, 5L))
  }

  test("per-query top-k with dense ranks, ties broken by doc id") {
    val out = Retrieval.bm25TopK(docs,
      Seq(0L -> "spark", 1L -> "fast"), k = 2).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.sameElements(Array(1L, 2L)))
    }
  }

  test("only broadcast exchanges: the corpus side never shuffles text") {
    val plan = Retrieval.bm25TopK(docs, Seq(0L -> "spark fast"), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"stats must ride a broadcast, not a cartesian:\n$plan")
  }

  test("index path equals the demo path and pushes the term filter down") {
    val path = graft.core.TempDirs.scratch("bm25_spec")
    Retrieval.buildIndex(docs, path)
    val queries = Seq(0L -> "spark fast", 1L -> "engine")
    val fromIdx = Retrieval.bm25TopKFromIndex(spark, path, queries, k = 10)
    val direct = Retrieval.bm25TopK(docs, queries, k = 10)
    assert(fromIdx.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
    val scan = fromIdx.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("In(term"),
      s"postings scan must push term IN (...) to parquet:\n$scan")
  }

  test("zero-token docs count in the index stats (null-marker row)") {
    // the empty doc contributes n_docs += 1 / sum_dl += 0 via its
    // term-null marker row; losing it would shift avgdl and every score
    val withEmpty = docs.unionByName(Seq((6L, "")).toDF("doc_id", "text"))
    val queries = Seq(0L -> "spark fast", 1L -> "engine")
    val direct = Retrieval.bm25TopK(withEmpty, queries, k = 10)
      .collect().map(_.toSeq).toSet
    val path = graft.core.TempDirs.scratch("bm25_empty_spec")
    Retrieval.buildIndex(withEmpty, path)
    val statsRow = spark.read.parquet(s"$path/stats").head()
    assert(statsRow.getAs[Long]("n_docs") == 6L,
      "the zero-token doc must count in n_docs")
    assert(statsRow.getAs[Long]("sum_dl") == 26L, // 5+5+6+8+2, empty adds 0
      "sum_dl must total the five real docs' token counts")
    assert(Retrieval.bm25TopKFromIndex(spark, path, queries, k = 10)
      .collect().map(_.toSeq).toSet == direct)
  }

  test("appended index ranks EXACTLY like a fresh build over the union") {
    val path = graft.core.TempDirs.scratch("bm25_append_spec")
    Retrieval.buildIndex(docs.where($"doc_id" <= 3), path)
    Retrieval.appendToIndex(docs.where($"doc_id" > 3), path)
    val queries = Seq(0L -> "spark fast", 1L -> "engine")
    val appended = Retrieval.bm25TopKFromIndex(spark, path, queries, k = 10)
    val direct = Retrieval.bm25TopK(docs, queries, k = 10)
    assert(appended.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
  }

  test("streamed postings append once — replays absorbed, ranking exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = graft.core.TempDirs.scratch("bm25_stream_spec")
    Retrieval.buildIndex(docs.where($"doc_id" <= 3), path)

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val late = Seq((4L, "fast fast fast fast fast fast fast fast"),
      (5L, "FAST spark"))
    val q = graft.streaming.StreamingRetrieval.appendPostings(stream, path,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      input.addData(late: _*)
      q.processAllAvailable()
      input.addData(late: _*) // source replay must not double-count
      q.processAllAvailable()
    } finally q.stop()

    val queries = Seq(0L -> "spark fast")
    val streamed = Retrieval.bm25TopKFromIndex(spark, path, queries, k = 10)
    val direct = Retrieval.bm25TopK(docs, queries, k = 10)
    assert(streamed.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
  }

  test("RRF: a doc ranked by both arms beats docs ranked by one") {
    import org.apache.spark.sql.functions.lit
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 10L, 2L), (0L, 12L, 1L)).toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), k = 10)
      .orderBy("rank").collect()
    assert(fused.head.getAs[Long]("doc_id") == 10L)
    // 1/61 + 1/62 for doc 10; 1/61 for 12; 1/62 for 11
    assert(fused.head.getAs[Double]("score") == 1.0 / 61 + 1.0 / 62)
    assert(fused.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 12L, 11L))
  }
}
