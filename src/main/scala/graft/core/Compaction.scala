package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staging-then-swap rewrite of a live parquet table — the shared shape
  * behind every "fold micro-batch accumulation back into the built
  * layout" maintenance pass ([[graft.llm.Retrieval.compactIndex]],
  * [[graft.llm.Ivf.compactIndex]], [[graft.storage.MdioDataset]]'s
  * chunk compaction): a long-appending stream leaves a few small files
  * per batch, and thousands of tiny files erode scan planning (every
  * file opens) and kill row-group skipping (no key locality across
  * files). The rewrite recluster-sorts the table so min/max column
  * stats make pushed `key IN (...)` filters skip whole row groups again.
  *
  * NOT concurrent-safe: the staged write fully commits before the
  * delete→rename swap, so a reader mid-swap can see a missing dir —
  * run with writers/readers quiesced (the streaming tiers call this
  * inside their serialized `foreachBatch`, which satisfies the
  * contract for the write side).
  */
object Compaction {

  /** Parquet data-file count under `path` (recursive). */
  def parquetFileCount(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Shuffle width for a table-volume-sized frame: targets `confKey`
    * bytes per partition (default 64 MB) instead of the session's fixed
    * `spark.sql.shuffle.partitions` — a fixed 32-partition shuffle made
    * the sf10 BM25 postings sort spill (SCALING.md round-14); at 100 TB
    * it would be a wall. `sized` must scan real files (a scratch stage
    * or the live table) so the optimizer stats are file sizes, not
    * guesses.
    */
  def sizedWidth(session: SparkSession, sized: DataFrame,
                 confKey: String): Int = {
    val perPartL = session.conf.get(confKey, (64L << 20).toString).toLong
    require(perPartL > 0, s"$confKey must be positive, got $perPartL")
    val sessionParts = session.conf.get("spark.sql.shuffle.partitions").toInt
    val size = sized.queryExecution.optimizedPlan.stats.sizeInBytes
    // UNKNOWN stats read as Long.MaxValue-scale (Catalyst's
    // defaultSizeInBytes; stats products can exceed it) — e.g. a
    // foreachBatch frame whose plan embeds a stateful streaming operator.
    // The old 2^20 clamp turned that into a million-task shuffle — each
    // task deserializing the whole serialized plan (measured: an 18 MiB
    // task binary × 2^20 tasks, a multi-hour hang on the streaming dedup
    // append). No stats ⇒ no sizing signal ⇒ use the session width.
    if (size >= BigInt(Long.MaxValue) / 16) sessionParts
    else {
      // clamp BEFORE narrowing: a bare .toInt on a BigInt quotient wraps
      // to an arbitrary partition count. 1 << 20 partitions ≈ 64 TB at
      // the default 64 MB target — past that, fail the math safe.
      val estParts = (size / BigInt(perPartL)).min(BigInt(1 << 20)).toInt + 1
      math.max(sessionParts, estParts)
    }
  }

  /** The standard compaction rewrite: recluster the table at `tablePath`
    * by `keys` (range-partitioned at [[sizedWidth]] width, sorted within
    * partitions on keys-then-rest for deterministic files), so pushed
    * `key IN (...)` filters skip whole row groups via parquet min/max
    * stats. Row-preserving — pure layout.
    */
  def recluster(spark: SparkSession, tablePath: String, keys: Seq[String],
                confKey: String): (Int, Int) =
    rewriteInPlace(spark, tablePath) { df =>
      val missing = keys.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"recluster keys ${missing.mkString(", ")} absent from " +
          s"$tablePath (columns ${df.columns.mkString(", ")})")
      val sortCols = keys ++ df.columns.filterNot(keys.contains)
      df.repartitionByRange(sizedWidth(spark, df, confKey),
          keys.map(df.col): _*)
        .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    }

  /** Rewrite the live parquet table at `tablePath` through `rewrite`
    * (recluster, sort, fold marker rows — anything row-preserving the
    * caller wants), staging to a sibling dot-dir and swapping only after
    * the staged write fully commits. Returns (parquet files before,
    * after).
    */
  def rewriteInPlace(spark: SparkSession, tablePath: String)
                    (rewrite: DataFrame => DataFrame): (Int, Int) = {
    val live = new Path(tablePath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nBefore = parquetFileCount(spark, tablePath)
    val staging = new Path(live.getParent, s".${live.getName}_compacting")
    fs.delete(staging, true): Unit
    rewrite(spark.read.parquet(tablePath))
      .write.mode("overwrite").parquet(staging.toString)
    // carry hidden metadata children across the swap: Spark data readers
    // ignore _/.-prefixed paths, but a streaming checkpoint may live
    // INSIDE the table dir (StreamingAnn.appendSignatures' default) and
    // deleting it would reset the stream's offsets and dedup state.
    // _SUCCESS stays behind — the staged write produced its own.
    fs.listStatus(live)
      .filter { st =>
        val n = st.getPath.getName
        (n.startsWith("_") || n.startsWith(".")) && n != "_SUCCESS"
      }
      .foreach { st =>
        if (!fs.rename(st.getPath, new Path(staging, st.getPath.getName)))
          throw new IllegalStateException(
            s"rewriteInPlace: could not carry ${st.getPath} into $staging")
      }
    fs.delete(live, true): Unit
    if (!fs.rename(staging, live))
      throw new IllegalStateException(
        s"rewriteInPlace: swap $staging -> $live failed")
    (nBefore, parquetFileCount(spark, tablePath))
  }
}
