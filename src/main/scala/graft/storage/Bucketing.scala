package graft.storage

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the co-located-join path for repeated large
  * joins (SURVEY §4's "pre-partitioning"; the chunk-grid analog for join
  * keys). Two tables bucketed on the same key with the same bucket count
  * sort-merge-join WITHOUT an exchange on either side: at 100 TB that
  * deletes the dominant shuffle from every trace⋈headers or fact⋈fact join
  * that repeats per analysis session.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCols: Seq[String],
                    nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty && nBuckets > 0, "need bucket columns and count")
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.drop(1): _*)
      .sortBy(bucketCols.head, bucketCols.drop(1): _*)
      .format("parquet")
      .saveAsTable(tableName)
  }
}
