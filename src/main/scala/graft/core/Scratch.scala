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
}
