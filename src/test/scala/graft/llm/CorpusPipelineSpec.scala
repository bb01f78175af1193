package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The full training-data pipeline, composed end-to-end from materialized
  * sketches: prepare (one text pass) → quality filter → near-dup pairs from
  * the STORED signatures (no re-shingling) → duplicate clusters → survivors
  * → deterministic stratified sample. After `prepare`, no stage touches the
  * text again — the 100-TB contract.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("prepare once, then dedup/cluster/sample from sketches only") {
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "morning sun rises slowly above the quiet green valley and birds sing"
    val docs = Seq(
      (1L, "s1", base),
      (2L, "s1", base),                       // exact dup of 1
      (3L, "s1", base.replace("dog", "cat")), // near dup of 1
      (4L, "s2", "completely different words about spark shuffles and wide plans today"),
      (5L, "s2", "x"),                        // fails the quality length band
    ).toDF("doc_id", "source", "text")

    val path = graft.core.TempDirs.scratch("pipeline")
    val prepared = CorpusPrep.prepare(docs, path)
    assert(prepared.count() == 5)

    // 1. quality gate reads the materialized score
    val quality = prepared.where(col("keep"))
    assert(!quality.select("doc_id").as[Long].collect().contains(5L))

    // 2. near-dup pairs from the stored signature column — no text access
    val pairs = Dedup.nearDupPairsFromSignatures(
      quality.select(col("doc_id"), col("sig")), minEstJaccard = 0.4)
    val pairSet = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairSet.contains((1L, 2L)))
    assert(pairSet.exists { case (a, b) => b == 3L || a == 3L })

    // 3. clusters + survivors
    val comp = Dedup.dupComponents(pairs)
    val survivors = quality.join(
      comp.where(!col("is_survivor")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val ids = survivors.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L) && !ids.contains(2L) && !ids.contains(3L))
    assert(ids.contains(4L))

    // 4. deterministic sample of the deduped corpus — reproducible subset
    val sampled = Sampling.stratifiedSample(survivors, "source",
      rates = Map("s1" -> 1.0, "s2" -> 1.0))
    assert(sampled.count() == survivors.count())

    // nothing in the pipeline left cached blocks behind
    assertNoLingeringCache()
  }
}
