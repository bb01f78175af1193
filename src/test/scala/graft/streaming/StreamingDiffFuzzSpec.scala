package graft.streaming

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential fuzzing STREAM vs BATCH for the streaming dedup tier: each
  * seeded random corpus is split across several micro-batches, run through
  * the stateful streaming operator, and the at-rest result is compared
  * against the batch operator over the same corpus — the cross-micro-batch
  * state machinery (bucket state, dedup state) must not change WHAT is
  * found, only WHEN. Corpora are built from a small vocabulary with
  * spliced shared phrases and verbatim copies, so both near-dup pairs and
  * exact duplicates occur in every case, frequently straddling the batch
  * boundary.
  */
class StreamingDiffFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], count: Int, seed0: Long): Seq[A] =
    (0 until count).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  private val phrase =
    "shared phrase tokens alpha beta gamma delta epsilon zeta eta".split(' ').toList

  private val docGen: Gen[List[String]] = for {
    len <- Gen.chooseNum(3, 12)
    words <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
    splice <- Gen.chooseNum(0, 2)
    at <- Gen.chooseNum(0, len)
  } yield
    if (splice > 0) words.take(at) ::: phrase ::: words.drop(at)
    else words

  private val corpusGen: Gen[List[(Long, String)]] = for {
    nd <- Gen.chooseNum(3, 8)
    docs <- Gen.listOfN(nd, docGen)
    dupFrom <- Gen.chooseNum(0, nd - 1)
    dupTimes <- Gen.chooseNum(1, 2)
  } yield (docs ::: List.fill(dupTimes)(docs(dupFrom)))
    .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }

  test("nearDupFlaggedStream over micro-batches equals batch nearDupPairs " +
       "on 12 seeded corpora") {
    implicit val sqlCtx = spark.sqlContext
    samples(corpusGen, 12, seed0 = 0xBEEF).zipWithIndex.foreach {
      case (docs, ci) =>
        val input = MemoryStream[(Long, String)]
        val q = StreamingCorpus.nearDupFlaggedStream(
            input.toDF().toDF("doc_id", "text"), maxBucketState = 10000)
          .toDF()
          .writeStream.format("memory").queryName(s"neardup_fuzz_$ci")
          .outputMode("append").start()
        // split across three micro-batches so bucket state must carry
        docs.grouped(math.max(1, docs.size / 3)).foreach { batch =>
          input.addData(batch: _*)
          q.processAllAvailable()
        }
        q.stop()
        val streamed = spark.table(s"neardup_fuzz_$ci")
          .as[(Long, Long, Double)].collect().toSet
        val batch = Dedup.nearDupPairs(docs.toDF("doc_id", "text"))
          .as[(Long, Long, Double)].collect().toSet
        assert(streamed == batch, s"case $ci: docs=$docs")
    }
  }

  test("dedupedStream over micro-batches equals batch distinct-by-hash " +
       "on 12 seeded corpora") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    samples(corpusGen, 12, seed0 = 0xFACE).zipWithIndex.foreach {
      case (docs, ci) =>
        val input = MemoryStream[(Long, String)]
        val q = StreamingCorpus.dedupedStream(
            input.toDF().toDF("doc_id", "text"))
          .select(md5(col("text")).as("h"), length(col("text")).as("len"))
          .writeStream.format("memory").queryName(s"dedup_fuzz_$ci")
          .outputMode("append").start()
        docs.grouped(math.max(1, docs.size / 3)).foreach { batch =>
          input.addData(batch: _*)
          q.processAllAvailable()
        }
        q.stop()
        val streamed = spark.table(s"dedup_fuzz_$ci")
          .as[(String, Int)].collect()
        val batch = docs.toDF("doc_id", "text")
          .select(md5(col("text")).as("h"), length(col("text")).as("len"))
          .distinct().as[(String, Int)].collect()
        // exactly one survivor per distinct content hash
        assert(streamed.length == batch.length, s"case $ci: docs=$docs")
        assert(streamed.toSet == batch.toSet, s"case $ci: docs=$docs")
    }
  }
}
