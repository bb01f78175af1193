package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.schema.{DatasetMetadata, MdioSchema, ScalarType, Variable}
import graft.storage.MdioDataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

class StreamingMdioSpec extends SparkSpec {
  import spark.implicits._

  private val schema = MdioSchema(
    variables = Seq(Variable("amp", Seq("il", "xl"), Left(ScalarType.Float64))),
    metadata = DatasetMetadata("stream", "1.0.0", "2026-01-01T00:00:00Z"))

  test("two micro-batches append into a batch-created store; sidecar and " +
       "layout survive; counts match") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("mdio-stream").toString
    val seed = (1 to 10).map(i => (i % 2, i, i * 0.5)).toDF("il", "xl", "amp")
    MdioDataset.write(seed, path, schema, sortDims = Seq("il", "xl"))

    val input = MemoryStream[(Int, Int, Double)]
    val stream = input.toDS().toDF("il", "xl", "amp")
    val q = StreamingMdio.appendToStore(stream, path,
      trigger = Trigger.ProcessingTime(0))
    try {
      input.addData((5, 100, 1.0), (5, 101, 2.0))
      q.processAllAvailable()
      assert(MdioDataset.open(spark, path).df.count() == 12)
      input.addData((6, 200, 3.0))
      q.processAllAvailable()
    } finally q.stop()

    val reopened = MdioDataset.open(spark, path)
    assert(reopened.df.count() == 13)
    assert(reopened.df.where(col("il") === 6).count() == 1)
    // the recorded layout survived both streamed appends
    assert(reopened.schema.layout.map(_.sortDims).contains(Seq("il", "xl")))
    // and the v2 reader sees the streamed rows through the sidecar schema
    assert(spark.read.format("mdio").load(path).count() == 13)
  }

  test("schema drift in a later batch fails the query before any file lands") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("mdio-stream-drift").toString
    val seed = Seq((1, 1, 1.0)).toDF("il", "xl", "amp")
    MdioDataset.write(seed, path, schema, sortDims = Seq("il", "xl"))

    // amp arrives as STRING — the recorded-DDL gate must reject the append
    val input = MemoryStream[(Int, Int, String)]
    val drifting = input.toDS().toDF("il", "xl", "amp")
    val q = StreamingMdio.appendToStore(drifting, path,
      checkpoint = Some(Files.createTempDirectory("ckpt").toString),
      trigger = Trigger.ProcessingTime(0))
    val ex = intercept[StreamingQueryException] {
      input.addData((2, 2, "oops"))
      q.processAllAvailable()
      q.awaitTermination(10000)
    }
    q.stop()
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("schema drift")), s"got: $ex")
    // no drifted rows landed
    assert(MdioDataset.open(spark, path).df.count() == 1)
  }

  test("compact folds micro-batch file accumulation back into the layout") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("mdio-stream-compact").toString
    val seed = (1 to 10).map(i => (i % 2, i, i * 0.5)).toDF("il", "xl", "amp")
    MdioDataset.write(seed, path, schema, sortDims = Seq("il", "xl"))

    val input = MemoryStream[(Int, Int, Double)]
    val q = StreamingMdio.appendToStore(input.toDS().toDF("il", "xl", "amp"),
      path, trigger = Trigger.ProcessingTime(0))
    try {
      (1 to 4).foreach { b =>
        input.addData((b, 100 + b, b * 1.0), (b, 200 + b, b * 2.0))
        q.processAllAvailable()
      }
    } finally q.stop()

    val rowsBefore = MdioDataset.open(spark, path).df
      .orderBy("il", "xl").collect().toSeq
    val ddlBefore = MdioDataset.readSidecar(spark, path)
      .flatMap(_.layout).flatMap(_.sparkSchemaDdl)
    val (nBefore, nAfter) = MdioDataset.compact(spark, path)
    assert(nBefore >= 5, s"4 micro-batches + seed should accumulate files: $nBefore")
    assert(nAfter < nBefore, s"compact must shrink the file count: $nBefore -> $nAfter")
    assert(nAfter == 1, s"18 tiny rows fit one layout-sized file: $nAfter")
    // row-identical, recorded layout + DDL unchanged, store still appendable
    val reopened = MdioDataset.open(spark, path)
    assert(reopened.df.orderBy("il", "xl").collect().toSeq == rowsBefore)
    assert(reopened.schema.layout.map(_.sortDims).contains(Seq("il", "xl")))
    assert(reopened.schema.layout.flatMap(_.sparkSchemaDdl) == ddlBefore)
    MdioDataset.write(Seq((9, 999, 9.0)).toDF("il", "xl", "amp"), path,
      reopened.schema, mode = MdioDataset.WriteMode.A)
    assert(MdioDataset.open(spark, path).df.count() == rowsBefore.size + 1)
  }

  test("compactEveryBatches bounds the file count of a long-running stream") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("mdio-stream-autocompact").toString
    val seed = Seq((0, 0, 0.0)).toDF("il", "xl", "amp")
    MdioDataset.write(seed, path, schema, sortDims = Seq("il", "xl"))

    val input = MemoryStream[(Int, Int, Double)]
    val q = StreamingMdio.appendToStore(input.toDS().toDF("il", "xl", "amp"),
      path, trigger = Trigger.ProcessingTime(0),
      compactEveryBatches = Some(2))
    try {
      (1 to 6).foreach { b =>
        input.addData((b, 10 * b, b * 1.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    // 6 batches with compact-every-2: the tail holds at most one compacted
    // set + one post-compact batch, never the 7 accumulated sets
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$path/data"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(files <= 3, s"auto-compaction must bound the file count, got $files")
    assert(MdioDataset.open(spark, path).df.count() == 7)
  }

  test("dedupKey state absorbs replayed rows across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("mdio-stream-dedup").toString
    val seed = Seq((0, 0, 0.0)).toDF("il", "xl", "amp")
    MdioDataset.write(seed, path, schema, sortDims = Seq("il", "xl"))

    val input = MemoryStream[(Int, Int, Double)]
    val stream = input.toDS().toDF("il", "xl", "amp")
    val q = StreamingMdio.appendToStore(stream, path, dedupKey = Some("xl"),
      trigger = Trigger.ProcessingTime(0))
    try {
      input.addData((1, 10, 1.0))
      q.processAllAvailable()
      input.addData((1, 10, 1.0), (2, 20, 2.0)) // (…,10,…) is a replay
      q.processAllAvailable()
    } finally q.stop()
    assert(MdioDataset.open(spark, path).df.where(col("xl") === 10).count() == 1)
    assert(MdioDataset.open(spark, path).df.count() == 3)
  }
}
