package graft.storage

import java.nio.file.Files

import graft.SparkSpec
import graft.schema._
import org.apache.spark.sql.functions._

/** The DataSourceV2 read surface: `spark.read.format("mdio").load(path)`. */
class MdioV2Spec extends SparkSpec {
  import spark.implicits._

  private val schema = MdioSchema(
    variables = Seq(Variable("amp", Seq("il", "xl"), Left(ScalarType.Float64))),
    metadata = DatasetMetadata("v2", "1.0.0", "2026-01-01T00:00:00Z"))

  private def df = (1 to 40).map(i => (i % 4, i, i * 0.5)).toDF("il", "xl", "amp")

  test("format(mdio) reads a store with the sidecar schema") {
    val path = Files.createTempDirectory("mdio-v2").toString
    MdioDataset.write(df, path, schema, sortDims = Seq("il", "xl"))
    val got = spark.read.format("mdio").load(path)
    assert(got.schema.fieldNames.toSeq == Seq("il", "xl", "amp"))
    assert(got.count() == 40)
    assert(got.where(col("il") === 2).count() == 10)
  }

  test("format(mdio) pushes predicates into the parquet scan") {
    val path = Files.createTempDirectory("mdio-v2p").toString
    MdioDataset.write(df, path, schema, sortDims = Seq("il", "xl"))
    val q = spark.read.format("mdio").load(path).where(col("xl") > 35)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(xl,35"),
      s"no pushdown in:\n$plan")
    assert(q.count() == 5)
  }

  test("format(mdio) pushes count/min/max aggregates into the parquet footers " +
       "when spark.sql.parquet.aggregatePushDown is on") {
    // the delegated builtin Parquet scan answers these from row-group
    // statistics without materializing a single data page — at 100 TB a
    // store-wide MIN/MAX/COUNT QC touches only footers
    val path = Files.createTempDirectory("mdio-v2agg").toString
    MdioDataset.write(df, path, schema, sortDims = Seq("il", "xl"))
    spark.conf.set("spark.sql.parquet.aggregatePushDown", "true")
    try {
      val q = spark.read.format("mdio").load(path)
        .agg(count(lit(1)).as("n"), min("xl").as("lo"), max("xl").as("hi"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"aggregates not pushed in:\n$plan")
      assert(q.as[(Long, Int, Int)].head() == ((40L, 1, 40)))
    } finally spark.conf.unset("spark.sql.parquet.aggregatePushDown")
  }

  test("format(mdio) on a partitioned store keeps the recorded column types") {
    val path = Files.createTempDirectory("mdio-v2part").toString
    MdioDataset.write(df, path, schema, sortDims = Seq("il", "xl"),
      partitionDims = Seq("il"))
    val got = spark.read.format("mdio").load(path)
    // directory inference would widen il; the sidecar DDL pins integer
    assert(got.schema("il").dataType.typeName == "integer")
    assert(got.where(col("il") === 1).select(sum(col("xl"))).as[Long].head() ==
      (1 to 40).filter(_ % 4 == 1).sum)
    // sel through the v2 reader matches the handle surface
    val viaHandle = MdioDataset.open(spark, path).df.count()
    assert(got.count() == viaHandle)
  }

  test("SQL surface: CREATE TABLE ... USING mdio resolves through the catalog") {
    val path = Files.createTempDirectory("mdio-sql").toString
    MdioDataset.write(df, path, schema, sortDims = Seq("il", "xl"))
    spark.sql(s"CREATE TABLE mdio_sql_t USING mdio OPTIONS (path '$path')")
    try {
      val got = spark.sql(
        "SELECT il, count(*) AS n, sum(xl) AS sxl FROM mdio_sql_t GROUP BY il")
      assert(got.count() == 4)
      assert(spark.sql("SELECT count(*) FROM mdio_sql_t WHERE xl > 35")
        .head().getLong(0) == 5L)
    } finally spark.sql("DROP TABLE mdio_sql_t")
  }

  test("format(mdio) rejects non-store paths") {
    val path = Files.createTempDirectory("not-a-store").toString
    intercept[IllegalArgumentException] {
      spark.read.format("mdio").load(path).count()
    }
  }

  // ------------------------------------------------------- DSv2 write path

  test("write.format(mdio) append lands rows through MdioDataset semantics") {
    val path = Files.createTempDirectory("mdio-w-append").toString
    MdioDataset.write(df.where(col("xl") <= 20), path, schema,
      sortDims = Seq("il", "xl"))
    df.where(col("xl") > 20).write.format("mdio").mode("append").save(path)
    val got = spark.read.format("mdio").load(path)
    assert(got.count() == 40)
    // the append kept the recorded layout + sidecar intact
    val sidecar = MdioDataset.readSidecar(spark, path).get
    assert(sidecar.layout.get.sortDims == Seq("il", "xl"))
    assert(sidecar.metadata.name == "v2")
  }

  test("write.format(mdio) overwrite maps to w; dynamic option maps to r+") {
    val path = Files.createTempDirectory("mdio-w-ovr").toString
    MdioDataset.write(df, path, schema, sortDims = Seq("xl"),
      partitionDims = Seq("il"))
    // full overwrite: only the new rows remain
    df.where(col("il") === 1).write.format("mdio").mode("overwrite").save(path)
    assert(spark.read.format("mdio").load(path).count() == 10)
    // region overwrite: il=2 partition replaced, il=1 untouched
    MdioDataset.write(df, path, schema, MdioDataset.WriteMode.W,
      sortDims = Seq("xl"), partitionDims = Seq("il"))
    df.where(col("il") === 2).withColumn("amp", lit(0.0))
      .write.format("mdio").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(path)
    val got = spark.read.format("mdio").load(path)
    assert(got.count() == 40)
    assert(got.where(col("il") === 2 && col("amp") =!= 0.0).count() == 0)
    assert(got.where(col("il") === 1 && col("amp") === 0.0).count() == 0)
  }

  test("write.format(mdio) to a fresh path creates the store (Zarr 'a')") {
    // Spark rejects ErrorIfExists/Ignore for TableProvider sources; append
    // is the create-if-absent mode, exactly like Zarr's 'a'
    val path = Files.createTempDirectory("mdio-w-fresh").toString + "/store"
    df.write.format("mdio").mode("append").option("sortDims", "il,xl").save(path)
    val sidecar = MdioDataset.readSidecar(spark, path).get
    assert(sidecar.layout.get.sortDims == Seq("il", "xl"))
    assert(spark.read.format("mdio").load(path).count() == 40)
  }

  test("append with a drifted column type fails loudly, not at read time") {
    val path = Files.createTempDirectory("mdio-w-drift").toString
    MdioDataset.write(df, path, schema, sortDims = Seq("il", "xl"))
    val drifted = df.withColumn("amp", col("amp").cast("float"))
    val e = intercept[Exception] {
      drifted.write.format("mdio").mode("append").save(path)
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[MdioDataset.LayoutMismatchError]),
      s"expected LayoutMismatchError in cause chain, got $e")
  }

  test("CREATE TABLE on a fresh path + INSERT creates the store from SQL alone") {
    val path = Files.createTempDirectory("mdio-sql-create").toString + "/store"
    spark.sql(
      s"CREATE TABLE mdio_fresh_t (il INT, xl INT, amp DOUBLE) USING mdio OPTIONS (path '$path')")
    try {
      spark.sql("INSERT INTO mdio_fresh_t VALUES (1, 10, 0.5), (2, 20, 1.5)")
      assert(MdioDataset.readSidecar(spark, path).isDefined, "sidecar created")
      assert(spark.sql("SELECT count(*) FROM mdio_fresh_t").head().getLong(0) == 2L)
      assert(spark.read.format("mdio").load(path).count() == 2L)
    } finally spark.sql("DROP TABLE mdio_fresh_t")
  }

  test("SQL INSERT INTO an mdio table appends through the store write path") {
    val path = Files.createTempDirectory("mdio-sql-ins").toString
    MdioDataset.write(df, path, schema, sortDims = Seq("il", "xl"))
    spark.sql(s"CREATE TABLE mdio_ins_t USING mdio OPTIONS (path '$path')")
    try {
      spark.sql("INSERT INTO mdio_ins_t VALUES (9, 99, 9.5)")
      assert(spark.sql("SELECT count(*) FROM mdio_ins_t").head().getLong(0) == 41L)
      assert(spark.sql("SELECT amp FROM mdio_ins_t WHERE xl = 99")
        .head().getDouble(0) == 9.5)
    } finally spark.sql("DROP TABLE mdio_ins_t")
  }
}
