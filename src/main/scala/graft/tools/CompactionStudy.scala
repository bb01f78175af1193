package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Tables, TempDirs}
import graft.llm.{Ivf, Retrieval}

/** Measures what index compaction actually buys (round-14 addition):
  * build the BM25 and IVF indexes, fragment them with many small appends
  * (the long-running-stream shape `compactEveryBatches` exists for),
  * time the SAME search on the fragmented index, compact, re-time.
  *
  * Wall clocks are median-of-3 ([[Bench.fullCount]] full-execution
  * clock); file counts come from the live table listing. Output: a
  * markdown table on stdout + JSON at SPARK_GRAFT_COMPACT_OUT
  * (default bench/compaction_study.json).
  *
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.CompactionStudy`
  */
object CompactionStudy {

  private def medianSecs(run: () => Unit): Double = {
    val times = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times(1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nAppends = sys.env.getOrElse("SPARK_GRAFT_COMPACT_APPENDS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.ArrayBuffer[
      (String, Int, Int, Double, Double)]()

    // ---------------- BM25: build 1 shard, append nAppends-1 shards
    val docs = Tables.documents(spark, sfDir)
    val bm25Path = TempDirs.scratch("compact_study_bm25")
    Retrieval.buildIndex(docs.where(col("doc_id") % nAppends === 0), bm25Path)
    (1 until nAppends).foreach { i =>
      Retrieval.appendToIndex(docs.where(col("doc_id") % nAppends === i), bm25Path)
    }
    val bm25Queries = Seq(0L -> "fast table scan", 1L -> "spark window query",
      2L -> "customer data stream")
    def bm25Run(): Unit = {
      graft.Bench.fullCount(
        Retrieval.bm25TopKFromIndex(spark, bm25Path, bm25Queries, k = 10)): Unit
    }
    bm25Run() // warm (JIT + page cache), outside the clock
    val bm25FragSec = medianSecs(() => bm25Run())
    val (bm25Before, bm25After) = Retrieval.compactIndex(spark, bm25Path)
    val bm25CompSec = medianSecs(() => bm25Run())
    results += (("bm25_postings", bm25Before, bm25After, bm25FragSec, bm25CompSec))

    // ---------------- IVF: build on 1 shard, append nAppends-1 shards
    val emb = Tables.embeddings(spark, sfDir)
    val ivfPath = TempDirs.scratch("compact_study_ivf")
    Ivf.buildIndexSeeded(emb.where(col("vec_id") % nAppends === 0), ivfPath)
    (1 until nAppends).foreach { i =>
      Ivf.appendToIndex(emb.where(col("vec_id") % nAppends === i), ivfPath)
    }
    def ivfRun(): Unit = {
      graft.Bench.fullCount(
        Ivf.ivfTopKFromIndex(emb, ivfPath, (0L until 10L), k = 10)): Unit
    }
    ivfRun()
    val ivfFragSec = medianSecs(() => ivfRun())
    val (ivfBefore, ivfAfter) = Ivf.compactIndex(spark, ivfPath)
    val ivfCompSec = medianSecs(() => ivfRun())
    results += (("ivf_cells", ivfBefore, ivfAfter, ivfFragSec, ivfCompSec))

    // ------------- LSH: lean table fragmented by per-shard appends; plus
    // the fat-vs-lean byte ratio (the tables× vector duplication)
    def dirBytes(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }
    val fatPath = TempDirs.scratch("compact_study_lsh_fat")
    graft.llm.Similarity.lshSignatures(emb, bits = 4, tables = 8, dim = 64)
      .write.parquet(fatPath)
    val leanPath = TempDirs.scratch("compact_study_lsh_lean")
    (0 until nAppends).foreach { i =>
      graft.llm.Similarity.lshSignaturesLean(
          emb.where(col("vec_id") % nAppends === i), bits = 4, tables = 8, dim = 64)
        .write.mode("append").parquet(leanPath)
    }
    def leanRun(): Unit = {
      graft.Bench.fullCount(graft.llm.Similarity.lshTopKFromLeanSignatures(
        spark.read.parquet(leanPath), emb, (0L until 10L), k = 10)): Unit
    }
    leanRun()
    val leanFragSec = medianSecs(() => leanRun())
    val (leanBefore, leanAfter) =
      graft.llm.Similarity.compactSignatures(spark, leanPath)
    val leanCompSec = medianSecs(() => leanRun())
    results += (("lsh_sigs_lean", leanBefore, leanAfter, leanFragSec, leanCompSec))
    val (fatBytes, leanBytes) = (dirBytes(fatPath), dirBytes(leanPath))
    println(f"[compaction-study] lsh fat=$fatBytes%d bytes lean=$leanBytes%d " +
      f"bytes ratio=${fatBytes.toDouble / leanBytes}%.1fx")

    // ------------- dedup signature index: fragmented by per-shard appends
    val dedupPath = TempDirs.scratch("compact_study_dedup")
    graft.llm.DedupIndex.buildIndex(docs.where(col("doc_id") % nAppends === 0), dedupPath)
    (1 until nAppends).foreach { i =>
      graft.llm.DedupIndex.appendToIndex(
        docs.where(col("doc_id") % nAppends === i), dedupPath)
    }
    def dedupRun(): Unit = {
      graft.Bench.fullCount(
        graft.llm.DedupIndex.pairsFromIndex(spark, dedupPath)): Unit
    }
    dedupRun()
    val dedupFragSec = medianSecs(() => dedupRun())
    val (dedupBefore, dedupAfter) =
      graft.llm.DedupIndex.compactIndex(spark, dedupPath)
    val dedupCompSec = medianSecs(() => dedupRun())
    results += (("dedup_sigs", dedupBefore, dedupAfter, dedupFragSec, dedupCompSec))

    println("| table | files fragmented | files compacted | query s (frag) | query s (compact) |")
    println("|---|---|---|---|---|")
    results.foreach { case (t, b, a, fs, cs) =>
      println(f"| $t | $b | $a | $fs%.3f | $cs%.3f |")
    }
    val json = results.map { case (t, b, a, fs, cs) =>
      f"""{"table":"$t","files_fragmented":$b,"files_compacted":$a,""" +
        f""""frag_sec":$fs%.4f,"compact_sec":$cs%.4f}"""
    }.mkString("[", ",", "]")
    val out = sys.env.getOrElse("SPARK_GRAFT_COMPACT_OUT",
      "bench/compaction_study.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      s"""{"sf_dir":"$sfDir","n_appends":$nAppends,""" +
        s""""lsh_fat_bytes":$fatBytes,"lsh_lean_bytes":$leanBytes,""" +
        s""""rows":$json}""")
    println(s"[compaction-study] wrote $out")
    spark.stop()
  }
}
