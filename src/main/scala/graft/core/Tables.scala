package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table loader for the driver-generated TPC-H-ish parquet tables
  * (TESTDATA.md). All queries take an `sfDir` and resolve tables here so the
  * same code runs at sf0.001 / 0.01 / 0.1 (and, unchanged, against a 100 TB
  * layout — `spark.read.parquet` on a directory of many files partitions
  * natively).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  /** `events.ts` arrives in whatever physical flavor the fixture generator
    * used; normalize every variant to a session-timezone TimestampType so
    * operators can rely on `cast(ts as bigint)`, window functions, and
    * streaming watermarks (which all reject TIMESTAMP_NTZ):
    *  - parquet TIMESTAMP(NANOS): Spark has no native type; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set by Verify/Bench
    *    sessions) it reads as LongType nanos — convert via integer div (the
    *    fixture's values are µs-aligned, so truncation is lossless).
    *  - parquet timestamp[us] without isAdjustedToUTC: Spark 4 infers
    *    TIMESTAMP_NTZ — cast to TimestampType, interpreting the naive value
    *    in the session timezone (UTC for all graft sessions), which matches
    *    how DuckDB's `epoch()` treats the same naive value in the oracle.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      // integer `div`, NOT `/`: epoch-nanos exceed double's 53-bit mantissa,
      // so float division would round the timestamp by up to 256 ns.
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every fixture table as a temp view (for spark.sql paths).
    * A missing file skips that one view instead of failing them all. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      try {
        val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
        df.createOrReplaceTempView(n)
      }
      catch { case e: Throwable =>
        System.err.println(s"[tables] skipping view $n: ${e.getMessage}")
      }
    }
}
