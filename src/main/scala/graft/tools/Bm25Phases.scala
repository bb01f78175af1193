package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Retrieval

/** Phase split for q_stream_bm25 — the round-15 decade sweep fixed its
  * exponent (1.41 → 0.92 after the persist-barrier append) but left the
  * sf10 CONSTANT unattributed: 167.8 s with no record of how much is the
  * half-corpus index build, the fixture staging, the streaming append
  * itself, or the final top-k query. This main runs the registered query's
  * exact composition with a timer around each phase, PLUS a direct batch
  * `appendToIndex` of the same delta against a copy of the index — the
  * streaming-harness overhead is then (stream_append − batch_append):
  * checkpoint+offset I/O, dedup state, marker bookkeeping.
  *
  * Phases (medians over SPARK_GRAFT_SCALE_REPEATS runs, default 3):
  *   build         — Retrieval.buildIndex on the even-id half
  *   stage         — writing the odd-id half out as the stream's source dir
  *                   (pure harness: a deployment streams a landing dir)
  *   stream_append — appendPostings via foreachBatch, AvailableNow
  *   batch_append  — Retrieval.appendToIndex of the same delta, no stream
  *   query         — bm25TopKFromIndex full-result execution
  *
  * `runMain graft.tools.Bm25Phases`; env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_SCALE_OUT (default bm25_phases_out.json).
  */
object Bm25Phases {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same demo queries as the registered q_stream_bm25 (SparkEntry's
    // literal list; duplicated here because the tool is not oracle-checked
    // and the entry's is private by design)
    val bm25Queries: Seq[(Long, String)] = Seq(
      0L -> "fast table scan",
      1L -> "spark window query",
      2L -> "customer data stream")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val repeats = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPEATS", "3").toInt
    require(repeats >= 1, s"repeats must be >= 1, got $repeats")

    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.foreach(_ => ()) // warm footers so run 1 isn't charged first-touch

    val phases = Seq("build", "stage", "stream_append", "batch_append", "query")
    val runs: Seq[Map[String, Double]] = (1 to repeats).map { _ =>
      val idx = graft.core.TempDirs.scratch("bm25ph_idx")
      val idx2 = graft.core.TempDirs.scratch("bm25ph_idx2")
      val ckpt = graft.core.TempDirs.scratch("bm25ph_ckpt")
      val srcDir = graft.core.TempDirs.scratch("bm25ph_src")
      val even = docs.where(col("doc_id") % 2 === 0)
      val odd = docs.where(col("doc_id") % 2 === 1)
      val tBuild = timed(Retrieval.buildIndex(even, idx))
      // second copy for the batch-append control (built untimed — same
      // work as tBuild; rebuilding avoids FS copy semantics differences)
      Retrieval.buildIndex(even, idx2)
      val tStage = timed(odd.write.parquet(srcDir))
      val tStream = timed {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = graft.streaming.StreamingRetrieval.appendPostings(
            spark.readStream.schema(spark.read.parquet(srcDir).schema)
              .parquet(srcDir),
            idx, checkpoint = Some(ckpt))
          q.awaitTermination()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
      val tBatch = timed(Retrieval.appendToIndex(
        spark.read.parquet(srcDir), idx2))
      val tQuery = timed {
        graft.Bench.fullCount(
          Retrieval.bm25TopKFromIndex(spark, idx, bm25Queries, k = 10)): Unit
      }
      Map("build" -> tBuild, "stage" -> tStage, "stream_append" -> tStream,
        "batch_append" -> tBatch, "query" -> tQuery)
    }
    def stats(p: String): (Double, Double) = {
      val xs = runs.map(_(p)).sorted
      (xs(xs.size / 2), xs.last - xs.head)
    }
    val body = phases.map { p =>
      val (med, spread) = stats(p)
      f""""$p":{"median_s":$med%.3f,"spread_s":$spread%.3f}"""
    }.mkString(",")
    val (sMed, _) = stats("stream_append")
    val (bMed, _) = stats("batch_append")
    val line = f"""{"sf":"$sfDir","repeats":$repeats,"phases":{$body},"harness_overhead_s":${sMed - bMed}%.3f}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "bm25_phases_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
  }
}
