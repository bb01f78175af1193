package graft.streaming

import graft.SparkSpec
import graft.llm.CorpusPrep
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The sketch kernels (md5-60 / minhash / simhash native expressions) must
  * produce identical values inside a streaming micro-batch plan — streamed
  * documents join the same dedup buckets as backfilled ones.
  */
class StreamingCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("streamed sketches equal batch sketches value-for-value") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different text about spark partitions and shuffles"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"))

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = StreamingCorpus.withSketchesStream(stream)
      .select("doc_id", "fp", "sig_h", "simhash", "quality", "n_bpeish")
      .writeStream.format("memory").queryName("corpus_stream")
      .outputMode("append").start()
    input.addData(docs: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("corpus_stream")
      .as[(Long, String, Long, Long, Double, Long)].collect().toSet
    val batch = CorpusPrep.withSketches(docs.toDF("doc_id", "text"))
      .select("doc_id", "fp", "sig_h", "simhash", "quality", "n_bpeish")
      .as[(Long, String, Long, Long, Double, Long)].collect().toSet
    assert(streamed == batch)
    // identical text → identical fingerprint/sketches across arrival modes
    val byId = streamed.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == byId(3L)._2 && byId(1L)._4 == byId(3L)._4)
  }

  test("appendPrepared lands a queryable prepared corpus") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("stream-corpus").toString
    val input = MemoryStream[(Long, String)]
    // data must be in the stream BEFORE the AvailableNow query starts —
    // AvailableNow latches the available offsets at start, so data added
    // after start() may or may not make the run (a real race, not a test
    // nicety)
    input.addData((7L, "some streamed document text here"))
    val q = StreamingCorpus.appendPrepared(
      input.toDF().toDF("doc_id", "text"), s"$path/corpus")
    q.awaitTermination()
    val out = spark.read.parquet(s"$path/corpus")
    assert(out.count() == 1)
    assert(out.columns.contains("sig") && out.columns.contains("fp"))
  }

  test("in-stream exact dedup: duplicates across micro-batches leave one survivor") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingCorpus.dedupedStream(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    input.addData((1L, "the same duplicated text"), (2L, "a distinct text"))
    q.processAllAvailable()
    input.addData((3L, "the same duplicated text")) // later batch, same content
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").as[(Long, String)].collect().map(_._1).toSet
    assert(ids == Set(1L, 2L), s"first arrival survives, later duplicate dropped: $ids")
  }

  test("appendPreparedDeduped drops duplicates even across query restarts") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("stream-dedup").toString
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    input.addData((1L, "the same duplicated text"), (2L, "a distinct text"))
    StreamingCorpus.appendPreparedDeduped(stream, s"$path/corpus").awaitTermination()
    // a second AvailableNow run from the same checkpoint: the seen-
    // fingerprint state was checkpointed, so the re-arrival is dropped
    input.addData((3L, "the same duplicated text"))
    StreamingCorpus.appendPreparedDeduped(stream, s"$path/corpus").awaitTermination()
    val out = spark.read.parquet(s"$path/corpus")
    assert(out.count() == 2)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("near-dup tier flags a paraphrase arriving in a LATER micro-batch; " +
       "distinct docs pass") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "every single day of the week without fail"
    val input = MemoryStream[(Long, String)]
    val flags = StreamingCorpus.nearDupFlaggedStream(
      input.toDF().toDF("doc_id", "text"), minEstJaccard = 0.4)
    val q = flags.writeStream.format("memory").queryName("neardup_flags")
      .outputMode("append").start()
    try {
      input.addData((1L, base),
        (4L, "completely different content about spark engines and parquet " +
          "row groups and shuffle partitions"))
      q.processAllAvailable()
      // batch 2: a light paraphrase of doc 1 — the bucket state from batch 1
      // must flag it
      input.addData((2L, base + " honestly"))
      q.processAllAvailable()
      val out = spark.table("neardup_flags")
        .as[StreamingCorpus.NearDupFlag].collect().toSeq
      assert(out.exists(f => f.id_a == 1L && f.id_b == 2L && f.est_jaccard >= 0.4),
        s"cross-batch paraphrase not flagged: $out")
      assert(!out.exists(f => f.id_a == 4L || f.id_b == 4L),
        s"distinct doc must not be flagged: $out")
    } finally q.stop()
  }

  test("hot-bucket flood: state stays BOUNDED at maxBucketState — asserted " +
      "on the stateOperators metrics, not argued from the cap parameter") {
    implicit val sqlCtx = spark.sqlContext
    val listener = StateMetrics.attach(spark)
    try {
      val input = MemoryStream[(Long, String)]
      // 500 identical docs: every band's bucket goes hot (the boilerplate
      // flood the streaming near-dup gate exists to survive)
      val text = "same boilerplate notice repeated across the entire corpus " +
        "by an aggressive crawler every single day"
      input.addData((1L to 500L).map(i => (i, text)): _*)
      val q = StreamingCorpus.nearDupFlaggedStream(
          input.toDF().toDF("doc_id", "text"), maxBucketState = 8)
        .writeStream.format("memory").queryName("hotbucket_flood")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      // listener events are async: poll until the progress lands
      var peak = listener.drain()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (peak._1 == 0 && System.nanoTime() < deadline) {
        Thread.sleep(100); peak = listener.drain()
      }
      val (stateRows, stateMem) = peak
      // identical signatures → exactly one bucket key per band (8 bands),
      // independent of the 500 arrivals; per-bucket payload capped at 8
      assert(stateRows > 0 && stateRows <= 8,
        s"state keys must be the band buckets, got $stateRows")
      assert(stateMem > 0 && stateMem < 10L * 1024 * 1024,
        s"flood state must stay capped, got $stateMem bytes")
      // overflow arrivals still flagged against the stored prefix
      assert(spark.table("hotbucket_flood").count() > 0)
    } finally spark.streams.removeListener(listener)
  }
}
