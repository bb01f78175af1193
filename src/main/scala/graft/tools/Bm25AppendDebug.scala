package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Retrieval

/** One-shot diagnostic for the sf10 batch-append anomaly the round-16 phase
  * split surfaced (bench/bm25_phases_sf10_r16.json): the SAME
  * `Retrieval.appendToIndex` costs ~13 s inside the foreachBatch stream and
  * ~180 s as a direct batch call at sf10, while at sf1 both cost ~2-3 s.
  * Attaches a job listener and prints every Spark job's wall time and
  * description during (a) the index build, (b) the batch append — so the
  * pathological job names itself.
  *
  * `runMain graft.tools.Bm25AppendDebug`; env SPARK_GRAFT_SF_DIR.
  */
object Bm25AppendDebug {

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

    val starts = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.synchronized {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("?")
          starts(j.jobId) = (System.nanoTime(), desc)
        }: Unit
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(j.jobId).foreach { case (t0, desc) =>
            done += ((j.jobId, (System.nanoTime() - t0) / 1e9, desc)): Unit
          }
        }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val secs = (for { a <- i.completionTime; b <- i.submissionTime }
          yield (a - b) / 1e3).getOrElse(-1.0)
        println(f"   [stage ${i.stageId}%4d] ${i.numTasks}%5d tasks ${secs}%8.2f s  ${i.name.take(90)}")
      }
    })
    def section(name: String)(body: => Unit): Unit = {
      done.synchronized(done.clear())
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"== $name: wall $wall%.1f s")
      done.synchronized(done.sortBy(_._1)).foreach { case (id, s, d) =>
        println(f"   job $id%4d  $s%8.2f s  ${d.take(110)}")
      }
    }

    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.foreach(_ => ())
    val idx = graft.core.TempDirs.scratch("bm25dbg_idx")
    val even = docs.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)
    section("build(even)")(Retrieval.buildIndex(even, idx))
    section("batch_append(odd)")(Retrieval.appendToIndex(odd, idx))
    section("query")(graft.Bench.fullCount(
      Retrieval.bm25TopKFromIndex(spark, idx,
        Seq(0L -> "fast table scan", 1L -> "spark window query",
          2L -> "customer data stream"), k = 10)): Unit)
    spark.stop()
  }
}
