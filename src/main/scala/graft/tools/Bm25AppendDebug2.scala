package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Isolation harness for the sf10 batch-append anomaly: times the
  * tokenize/explode/aggregate pipeline of [[graft.llm.Retrieval]] over the
  * same documents under different INPUT SHAPES, to find which component
  * carries the 14x per-doc constant the stream path doesn't pay.
  * `runMain graft.tools.Bm25AppendDebug2`; env SPARK_GRAFT_SF_DIR.
  */
object Bm25AppendDebug2 {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
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

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows $n)")
    }
    val idCol = "doc_id"
    def agg(docs: DataFrame): DataFrame = {
      val toks = TextAnalysis.tokens(lower(col("text")))
      docs.select(col(idCol), size(toks).cast("long").as("dl"),
          posexplode_outer(toks).as(Seq("_pos", "term")))
        .groupBy(col(idCol), col("dl"), col("term"))
        .agg(count(lit(1)).cast("long").as("tf"), min(col("_pos")).as("_mp"))
    }
    def explodeOnly(docs: DataFrame): DataFrame = {
      val toks = TextAnalysis.tokens(lower(col("text")))
      docs.select(col(idCol), posexplode_outer(toks).as(Seq("_pos", "term")))
    }

    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.foreach(_ => ())
    val odd = docs.where(col(idCol) % 2 === 1)
    val srcDir = graft.core.TempDirs.scratch("bm25dbg2_src")
    odd.write.parquet(srcDir)
    val staged = spark.read.parquet(srcDir)

    timed("tokenize_count_raw")(odd.select(size(TextAnalysis.tokens(lower(col("text")))).as("n")).agg(sum("n")).collect().head.getLong(0))
    timed("explode_only_staged")(explodeOnly(staged).queryExecution.toRdd.count())
    timed("agg_staged (phases batch shape)")(agg(graft.core.Scratch.rebalance(staged)).queryExecution.toRdd.count())
    timed("agg_shuffled (stream-ish shape)")(agg(staged.repartition(32, col(idCol))).queryExecution.toRdd.count())
    timed("agg_dropdup (exact stream shape)")(agg(staged.dropDuplicates(idCol)).queryExecution.toRdd.count())
    println("---- plan: agg_staged ----")
    println(agg(graft.core.Scratch.rebalance(staged)).queryExecution.executedPlan.toString.take(4000))
    println("---- plan: agg_dropdup ----")
    println(agg(staged.dropDuplicates(idCol)).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
