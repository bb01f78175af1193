package graft.core

import org.apache.spark.sql.DataFrame

/** Materialize-once staging for operators whose intermediates feed multiple
  * downstream scans (LSH bucket tables, inverted shingle indexes, normalized
  * vectors).
  *
  * Round 2 used `.persist()` for these and leaked the cached blocks (the
  * operator returns a lazy frame, so there is no safe point to unpersist).
  * Staging to Parquet instead cuts the lineage the same way, costs one
  * columnar write of a *summary-sized* table (signatures/hashes, never the
  * raw text), and leaves `spark.sparkContext.getPersistentRDDs` empty — at
  * 100 TB this is also simply the right design: sketches are computed once
  * per corpus and stored beside it, not recomputed per query (the
  * reference's materialize-once philosophy, `optimize/access_pattern.py`).
  */
object Scratch {

  /** Write `df` to a scratch Parquet path (explicit or a fresh tmp dir) and
    * return the re-opened, lineage-free frame.
    */
  def stage(df: DataFrame, tag: String, path: Option[String] = None): DataFrame = {
    val p = path.getOrElse(TempDirs.scratch(s"scratch_$tag"))
    df.write.mode("overwrite").parquet(p)
    df.sparkSession.read.parquet(p)
  }

  /** [[stage]] whose lifetime is the `body` call: the scratch files are
    * deleted (and deregistered from the exit hook) as soon as `body`
    * returns or throws. [[stage]] can't do this — it returns a lazy frame
    * whose scan outlives the call — but a caller that fully CONSUMES the
    * staged frame inside one scope (e.g. a per-micro-batch index append,
    * [[graft.llm.Retrieval.appendToIndex]]) must use this form: one
    * scratch dir per micro-batch held until JVM exit is unbounded disk
    * growth on a long-running stream.
    */
  def withStage[T](df: DataFrame, tag: String)(body: DataFrame => T): T = {
    val p = TempDirs.scratch(s"scratch_$tag")
    try {
      df.write.mode("overwrite").parquet(p)
      body(df.sparkSession.read.parquet(p))
    } finally TempDirs.release(p)
  }

  /** [[stage]] gated on the SOURCE's optimizer-estimated scan size: below
    * `graft.scratch.stageMinBytes` (default 64 MB) the write round-trip
    * costs more than just recomputing the subtree in each consumer arm, so
    * the frame is returned un-staged. Above it (always true at real scale)
    * the one summary-sized write wins. The estimate comes from the
    * optimized plan's statistics — no job is triggered.
    */
  def stageIfLarge(df: DataFrame, tag: String, source: DataFrame): DataFrame = {
    val minBytes = BigInt(source.sparkSession.conf
      .get("graft.scratch.stageMinBytes", (64L << 20).toString).toLong)
    if (source.queryExecution.optimizedPlan.stats.sizeInBytes >= minBytes)
      stage(df, tag)
    else df
  }

  /** Rebalance a COMPACT scan ahead of a compute-heavy map (tokenize,
    * shingle, explode): a table small enough to plan fewer partitions than
    * the session's parallelism would otherwise run the whole downstream
    * compute on those few tasks (one 600 KB parquet file = ONE task doing
    * every document's explode). At real scale the source plans >= target
    * splits and this is the identity — no shuffle is ever added to a big
    * scan. The round-robin exchange it inserts on small inputs moves only
    * the compact source bytes.
    *
    * Scheduled split count is NOT achievable parallelism for a file scan:
    * Spark byte-range-splits parquet regardless of row-group layout, and
    * only the split containing a row group's start reads its rows — a
    * writer that emitted one giant row group per file (pyarrow's default
    * up to 2^20 rows, common for mid-size tables) yields 32 scheduled
    * splits of which 31 are EMPTY, and every downstream kernel runs on
    * one core. Measured at sf10: the BM25 index build's tokenize+aggregate
    * over a one-row-group 57 MB documents table ran 32 tasks at
    * concurrency 1.07 — 183 s where the same plan behind an exchange takes
    * 9 s (bench/bm25_phases_sf10_r16.json, round-16 diagnosis). So a
    * FILE-BACKED frame with fewer files than target parallelism (each file
    * guarantees only as many data-bearing splits as row groups — worst
    * case one) is spread explicitly whenever the table is compact enough
    * that the spread is negligible insurance
    * (`graft.rebalance.forceBytes`, default 2 GiB, optimizer-estimated —
    * no job). Frames with >= target files, in-memory frames, and
    * beyond-threshold tables keep the scan as planned: at real scale
    * inputs arrive as many files and the guard never fires.
    */
  def rebalance(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) return df.repartition(target)
    val files =
      try df.inputFiles catch { case _: Throwable => Array.empty[String] }
    if (files.nonEmpty && files.length < target) {
      val forceBytes = BigInt(spark.conf
        .get("graft.rebalance.forceBytes", (2L << 30).toString).toLong)
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= forceBytes)
        return df.repartition(target)
    }
    df
  }
}
