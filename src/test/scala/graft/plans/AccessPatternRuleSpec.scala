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

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten

  test("swap dim picked by predicate class: equality beats range, IN beats range") {
    GraftSparkExtensions.install(spark)
    AccessPatternCatalog.clear()
    val base = Files.createTempDirectory("apr2").toString
    val df = (1 to 1000).map(i => (i % 50, i % 77, i * 1.0)).toDF("aa", "zz", "amp")
    df.write.parquet(s"$base/base")
    AccessPatterns.optimize(df, base, Seq("aa", "zz"), partitions = 4)
    AccessPatternCatalog.register(s"$base/base", "aa", AccessPatterns.fastTablePath(base, "aa"))
    AccessPatternCatalog.register(s"$base/base", "zz", AccessPatterns.fastTablePath(base, "zz"))

    // range on aa (alphabetically first), equality on zz → zz must win
    val q = spark.read.parquet(s"$base/base")
      .where(col("aa") > 10 && col("zz") === 3)
    assert(scanPaths(q).exists(_.contains("fast_zz")),
      s"equality predicate should pick fast_zz, got ${scanPaths(q)}")
    assert(q.count() == df.where(col("aa") > 10 && col("zz") === 3).count())

    // IN on zz vs range on aa → zz still wins
    val qIn = spark.read.parquet(s"$base/base")
      .where(col("aa") > 10 && col("zz").isin(3, 4))
    assert(scanPaths(qIn).exists(_.contains("fast_zz")))

    // equality on both → alphabetical tie-break (aa)
    val qTie = spark.read.parquet(s"$base/base")
      .where(col("aa") === 5 && col("zz") === 3)
    assert(scanPaths(qTie).exists(_.contains("fast_aa")))
    AccessPatternCatalog.clear()
  }

  test("bbox on both z-dims swaps to the z-order table; single-dim filter " +
       "prefers fast_<dim>") {
    GraftSparkExtensions.install(spark)
    AccessPatternCatalog.clear()
    val base = Files.createTempDirectory("aprz").toString
    val df = (0 until 1024).map(i => (i % 32, i / 32, i * 1.0))
      .toDF("il", "xl", "amp")
    df.write.parquet(s"$base/base")
    val zPath = AccessPatterns.optimizeZorder(df, base, Seq("il", "xl"),
      bits = 6, partitions = 4)
    AccessPatterns.optimize(df, base, Seq("il"), partitions = 4)
    AccessPatternCatalog.register(s"$base/base", "il",
      AccessPatterns.fastTablePath(base, "il"))
    AccessPatternCatalog.registerMulti(s"$base/base", Set("il", "xl"), zPath)

    // bounding box on BOTH dims → the z layout serves the scan
    val bbox = spark.read.parquet(s"$base/base")
      .where(col("il").between(3, 9) && col("xl").between(10, 20))
    assert(scanPaths(bbox).exists(_.contains("fast_z_")),
      s"expected z-order scan, got ${scanPaths(bbox)}")
    assert(bbox.count() ==
      df.where(col("il").between(3, 9) && col("xl").between(10, 20)).count())
    assert(bbox.select(sum(col("amp"))).as[Double].head() ==
      df.where(col("il").between(3, 9) && col("xl").between(10, 20))
        .select(sum(col("amp"))).as[Double].head())

    // only one z-dim filtered → the z table must NOT serve it; fast_il does
    val one = spark.read.parquet(s"$base/base").where(col("il") === 5)
    assert(!scanPaths(one).exists(_.contains("fast_z_")))
    assert(scanPaths(one).exists(_.contains("fast_il")))
    AccessPatternCatalog.clear()
  }

  test("analyzed fast relations are cached — one listing per fast table") {
    GraftSparkExtensions.install(spark)
    AccessPatternCatalog.clear()
    val base = Files.createTempDirectory("apr3").toString
    val df = (1 to 500).map(i => (i % 20, i * 1.0)).toDF("inline", "amp")
    df.write.parquet(s"$base/base")
    AccessPatterns.optimize(df, base, Seq("inline"), partitions = 2)
    AccessPatternCatalog.register(s"$base/base", "inline",
      AccessPatterns.fastTablePath(base, "inline"))

    val before = AccessPatternCatalog.relBuilds.get()
    spark.read.parquet(s"$base/base").where(col("inline") === 1).count()
    val afterFirst = AccessPatternCatalog.relBuilds.get()
    assert(afterFirst > before, "first query must analyze the fast relation")
    spark.read.parquet(s"$base/base").where(col("inline") === 2).count()
    spark.read.parquet(s"$base/base").where(col("inline") === 3).count()
    assert(AccessPatternCatalog.relBuilds.get() == afterFirst,
      "subsequent queries must reuse the cached relation (no re-listing)")

    // re-registering (re-materialization) invalidates the cache
    AccessPatternCatalog.register(s"$base/base", "inline",
      AccessPatterns.fastTablePath(base, "inline"))
    spark.read.parquet(s"$base/base").where(col("inline") === 4).count()
    assert(AccessPatternCatalog.relBuilds.get() > afterFirst)
    AccessPatternCatalog.clear()
  }
}
