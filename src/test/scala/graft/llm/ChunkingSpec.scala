package graft.llm

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping chunks cover the token stream with the declared stride") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val got = Chunking.chunkDocs(docs, chunkTokens = 4, stride = 2)
      .orderBy("chunk_idx")
      .collect()
    // n=10, chunk=4, stride=2 → last_idx = ceil(6/2) = 3 → starts 0,2,4,6
    assert(got.map(_.getAs[Int]("chunk_start")).toSeq == Seq(0, 2, 4, 6))
    assert(got.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9"))
    assert(got.forall(_.getAs[Int]("n_chunk_tokens") == 4))
  }

  test("ragged tail: last chunk is clamped, not dropped") {
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunking.chunkDocs(docs, chunkTokens = 3, stride = 3)
      .orderBy("chunk_idx").collect()
    // n=7, chunk=stride=3 → exact partitioning with a 1-token tail
    assert(got.map(_.getAs[String]("chunk_text")).toSeq ==
      Seq("a b c", "d e f", "g"))
    assert(got.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(3, 3, 1))
  }

  test("short and empty docs yield exactly one chunk each") {
    val docs = Seq((1L, "only two"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val got = Chunking.chunkDocs(docs, chunkTokens = 16, stride = 8)
      .collect()
    assert(got.length == 3)
    assert(got.forall(_.getAs[Int]("chunk_idx") == 0))
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("chunk_text") == "only two")
    assert(byId(2L).getAs[Int]("n_chunk_tokens") == 0)
    assert(byId(3L).getAs[Int]("n_chunk_tokens") == 0)
  }

  test("non-overlapping chunks reconstruct the document exactly") {
    val text = (0 until 23).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Chunking.chunkDocs(docs, chunkTokens = 5, stride = 5)
      .orderBy("chunk_idx")
      .collect()
    assert(got.map(_.getAs[String]("chunk_text")).mkString(" ") == text)
  }

  test("chunking is a narrow plan: no exchange") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunking.chunkDocs(docs, 4, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
