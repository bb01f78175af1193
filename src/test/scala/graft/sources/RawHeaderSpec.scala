package graft.sources

import graft.SparkSpec
import graft.schema._
import graft.storage.MdioDataset
import org.apache.spark.sql.functions._

/** V240 raw-headers path (`ingestion/segy/raw_headers.py:32-64`): pack the
  * undecoded header block as a fixed 240-byte binary column, carry it
  * through an MDIO store as a `V240` variable, re-parse fields from bytes.
  */
class RawHeaderSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("il", "xl", "off")
  private val df = Seq(
    (1, 10, -3),
    (2, 20, 0),
    (2147483647, -2147483648, 7),
  ).toDF("il", "xl", "off")

  test("packRawHeader is 240 bytes; parseRawHeaderField inverts it (signed)") {
    val packed = Sources.withRawHeaders(df, fields)
    assert(packed.select(octet_length(col("raw_headers"))).as[Int].collect()
      .forall(_ == 240))
    val back = packed.select(
      Sources.parseRawHeaderField(col("raw_headers"), 0).as("il2"),
      Sources.parseRawHeaderField(col("raw_headers"), 1).as("xl2"),
      Sources.parseRawHeaderField(col("raw_headers"), 2).as("off2"))
      .as[(Long, Long, Long)].collect().toSet
    assert(back == Set((1L, 10L, -3L), (2L, 20L, 0L),
      (2147483647L, -2147483648L, 7L)))
    // padding beyond the packed fields is zeros
    val tail = packed.select(hex(substring(col("raw_headers"), 13, 228)))
      .as[String].collect()
    assert(tail.forall(_.forall(_ == '0')))
  }

  test("ingest pipeline stores raw_headers as a V240 variable when asked") {
    import graft.ingestion.{GridOverrides, IngestPipeline}
    import graft.schema.TemplateRegistry
    val rows = for (il <- 1 to 5; xl <- 1 to 4)
      yield (il, xl, il * 100.0 + xl)
    val traces = {
      import spark.implicits._
      rows.toDF("inline", "crossline", "amplitude")
    }
    val path = java.nio.file.Files.createTempDirectory("raw-ingest").toString
    IngestPipeline.ingest(spark, traces,
      TemplateRegistry.instance.get("PostStack3DTime"), GridOverrides(), path,
      ordinal = Seq("inline", "crossline"), valueCol = "amplitude",
      rawHeaderFields = Seq("inline", "crossline"))
    val ds = MdioDataset.open(spark, path)
    assert(ds.schema.variable("raw_headers")
      .exists(_.dataType == Left(ScalarType.Bytes240)))
    val parsed = ds.df.select(
      col("inline"),
      Sources.parseRawHeaderField(col("raw_headers"), 0).as("il2"),
      Sources.parseRawHeaderField(col("raw_headers"), 1).as("xl2"),
      col("crossline"))
    assert(parsed.where(col("inline") =!= col("il2") ||
      col("crossline") =!= col("xl2")).count() == 0)
    assert(parsed.count() == 20)
  }

  test("raw headers round-trip through an MDIO store as a V240 variable") {
    val path = java.nio.file.Files.createTempDirectory("raw-hdr").toString
    val schema = MdioSchema(
      variables = Seq(
        Variable("raw_headers", Seq("il", "xl"), Left(ScalarType.Bytes240)),
        Variable("il", Seq("il"), Left(ScalarType.Int32))),
      metadata = DatasetMetadata("raw", "1.0.0", "2026-01-01T00:00:00Z"))
    MdioDataset.write(Sources.withRawHeaders(df, fields), path, schema,
      sortDims = Seq("il"))
    val ds = MdioDataset.open(spark, path)
    assert(ds.schema.variable("raw_headers")
      .exists(_.dataType == Left(ScalarType.Bytes240)))
    val back = ds.df.select(
      col("il"),
      Sources.parseRawHeaderField(col("raw_headers"), 0).as("il2"))
      .as[(Int, Long)].collect()
    assert(back.nonEmpty && back.forall { case (il, il2) => il.toLong == il2 })
  }
}
