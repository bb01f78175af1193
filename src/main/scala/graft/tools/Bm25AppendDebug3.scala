package graft.tools

import org.apache.spark.scheduler.SparkListenerStageCompleted
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Second isolation pass for the fused scan→generate→partial-agg cliff:
  * prints per-stage GC time / spill / peak memory, and re-times the slow
  * shape under codegen / vectorized-reader / fallback toggles.
  * `runMain graft.tools.Bm25AppendDebug3`; env SPARK_GRAFT_SF_DIR.
  */
object Bm25AppendDebug3 {

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
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val secs = (for { a <- i.completionTime; b <- i.submissionTime }
          yield (a - b) / 1e3).getOrElse(-1.0)
        println(f"   [stage ${i.stageId}%3d] ${i.numTasks}%4d tasks wall $secs%7.1f s " +
          f"run ${m.executorRunTime / 1e3}%8.1f s gc ${m.jvmGCTime / 1e3}%7.1f s " +
          f"spillMem ${m.memoryBytesSpilled / 1e6}%7.0f MB spillDisk ${m.diskBytesSpilled / 1e6}%7.0f MB " +
          f"peakExecMem ${m.peakExecutionMemory / 1e6}%7.0f MB")
      }
    })

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

    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.foreach(_ => ())
    val odd = docs.where(col(idCol) % 2 === 1)
    val srcDir = graft.core.TempDirs.scratch("bm25dbg3_src")
    odd.write.parquet(srcDir)
    val staged = spark.read.parquet(srcDir)

    def run(name: String, confs: (String, String)*): Unit = {
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try timed(name)(agg(staged).queryExecution.toRdd.count())
      finally prev.foreach { case (k, o) =>
        o.fold(spark.conf.unset(k))(v => spark.conf.set(k, v)) }
    }
    run("baseline_fused")
    run("no_wholestage", "spark.sql.codegen.wholeStage" -> "false")
    run("no_vectorized", "spark.sql.parquet.enableVectorizedReader" -> "false")
    run("fallback_1", // force sort-fallback immediately: is the hash map the term?
      "spark.sql.execution.useObjectHashAggregateExec" -> "false")
    spark.stop()
  }
}
