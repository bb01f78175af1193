package graft.tools

import org.apache.spark.sql.SparkSession

/** Job-level profiler for the ingest E2E query: runs q_ingest_e2e cold+warm
  * with a listener that prints per-job wall times — the tool behind the
  * "where do the seconds go" analysis when tuning the ingest tail.
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler._
    val jobTimes = scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
    val starts = scala.collection.mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("callSite.short")).getOrElse(
            Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.get(je.jobId).foreach { case (t0, d) =>
          jobTimes += ((je.jobId, System.nanoTime() - t0, d.take(60))) }
    })
    // warm
    spark.read.parquet(s"$sfDir/lineitem.parquet").foreach(_ => ())
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      jobTimes.clear()
      val df = graft.SparkEntry.queries("q_ingest_e2e")(spark, sfDir)
      df.count()
      println(f"[$tag] total ${(System.nanoTime() - t0) / 1e9}%.2f s, ${jobTimes.size} jobs")
      jobTimes.foreach { case (id, ns, d) => println(f"  job $id%3d ${ns / 1e9}%6.2f  $d") }
    }
    run("cold"); run("warm")
    spark.stop()
  }
}
