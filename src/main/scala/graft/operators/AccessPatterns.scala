package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O1 `optimize_access_patterns` — materialized alternate clusterings.
  *
  * Reference `optimize/access_pattern.py:26-118`: for each requested dim,
  * write a `fast_<dim>` copy of the default variable rechunked for that
  * access axis, optionally lossy-compressed with tolerance = quality × std.
  * In Spark the "rechunk" is a `repartitionByRange(dim) + sortWithinPartitions
  * (dim)` rewrite: the same rows, clustered so predicates on `dim` prune
  * files via Parquet min/max stats — a materialized view, chosen per query by
  * `resolve` (catalog-level selection; SURVEY §4 notes a Catalyst relation-
  * swap Rule as the later upgrade).
  */
object AccessPatterns {

  def fastTablePath(basePath: String, dim: String): String = s"$basePath/fast_$dim"

  /** Materialize one clustering per requested dim. */
  def optimize(df: DataFrame, basePath: String, dims: Seq[String],
               partitions: Int = 0): Unit =
    dims.foreach { d =>
      val n = if (partitions > 0) partitions
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      df.repartitionByRange(n, col(d))
        .sortWithinPartitions(col(d))
        .write.mode("overwrite")
        .parquet(fastTablePath(basePath, d))
    }

  /** ZFP-tolerance parity: quantize to the given absolute tolerance before
    * (Parquet-)compressing — `round(x / (2·tol)) · 2·tol`, an explicit,
    * honest approximation of fixed-accuracy ZFP (`optimize/common.py:42-53`;
    * tolerance = quality × std, quality ∈ {6,3,1,0.1,0.01,0.001}).
    */
  def quantize(c: Column, tolerance: Double): Column = {
    require(tolerance > 0, "tolerance must be positive")
    (round(c / (2 * tolerance)) * (2 * tolerance))
  }

  /** Pick the best materialization for a predicate dim: `fast_<dim>` when it
    * exists, else the base table. Catalog-level resolve — the caller's query
    * shape is unchanged either way.
    */
  def resolve(spark: SparkSession, basePath: String, baseTable: String,
              predicateDim: String): DataFrame = {
    val fast = new Path(fastTablePath(basePath, predicateDim))
    val fs = fast.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(fast)) spark.read.parquet(fast.toString)
    else spark.read.parquet(s"$basePath/$baseTable")
  }
}
