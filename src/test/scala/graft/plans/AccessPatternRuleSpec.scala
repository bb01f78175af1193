package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.AccessPatterns
import org.apache.spark.sql.functions._

class AccessPatternRuleSpec extends SparkSpec {
  import spark.implicits._

  test("optimizer swaps the scan to fast_<dim> when a filter matches") {
    GraftSparkExtensions.install(spark)
    AccessPatternCatalog.clear()

    val base = Files.createTempDirectory("apr").toString
    val df = (1 to 1000).map(i => (i % 50, i, i * 1.0)).toDF("inline", "xl", "amp")
    df.write.parquet(s"$base/base")
    AccessPatterns.optimize(df, base, Seq("inline"), partitions = 4)
    AccessPatternCatalog.register(s"$base/base", "inline",
      AccessPatterns.fastTablePath(base, "inline"))

    val q = spark.read.parquet(s"$base/base").where(col("inline") === 7)
    // LogicalRelation.toString omits the path — inspect the scan's location
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)
      }.flatten
    assert(scanPaths(q).exists(_.contains("fast_inline")),
      s"expected fast_inline scan, got ${scanPaths(q)}")
    // results identical to the base table
    assert(q.count() == df.where(col("inline") === 7).count())
    assert(q.select(sum(col("amp"))).as[Double].head() ==
      df.where(col("inline") === 7).select(sum(col("amp"))).as[Double].head())

    // a filter on a non-optimized dim keeps the base relation
    val q2 = spark.read.parquet(s"$base/base").where(col("xl") === 3)
    assert(!scanPaths(q2).exists(_.contains("fast_")))
    AccessPatternCatalog.clear()
  }
}
