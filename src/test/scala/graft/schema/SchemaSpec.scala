package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Schema-core tests: JSON round-trip (like the reference's
  * `tests/unit/v1/test_dataset_serializer.py`) and golden structure checks
  * for all registered templates (like `tests/unit/v1/templates/`).
  */
class SchemaJsonSpec extends AnyFunSuite {

  private val schema = MdioSchema(
    variables = Seq(
      Variable("amplitude", Seq("inline", "crossline", "time"),
        Left(ScalarType.Float32),
        compressor = Some(Blosc()),
        coordinates = Seq("cdp_x", "cdp_y"),
        metadata = Some(VariableMetadata(
          chunkGrid = Some(RegularChunkGrid(Seq(128, 128, 128))),
          statsV1 = Some(SummaryStatistics(100, 50.0, 30.0, -1.0, 2.0)),
          unitsV1 = Some("millisecond")))),
      Variable("headers", Seq("inline", "crossline"),
        Right(StructuredType(Seq(
          StructuredField("inline", ScalarType.Int32),
          StructuredField("cdp_x", ScalarType.Float64)))))),
    metadata = DatasetMetadata("test", "1.0.0", "2026-01-01T00:00:00Z",
      Map("textHeader" -> "C 1 CLIENT", "k" -> "v")),
    dimensions = Seq(NamedDimension("inline", 345), NamedDimension("crossline", 188),
      NamedDimension("time", 1501)))

  test("JSON round-trip preserves the full schema") {
    val json = SchemaJson.toJson(schema)
    assert(SchemaJson.fromJson(json) == schema)
  }

  test("every declared scalar dtype survives the JSON round-trip; Spark " +
      "DDL maps complex as structs and refuses the unrepresentable loudly") {
    // dtype.py:16-35 declares the full set; a schema CARRYING any of them
    // must round-trip even when ingestion never produces the value
    ScalarType.values.foreach { t =>
      val s = schema.copy(variables = Seq(
        Variable("v", Seq("inline"), Left(t))))
      assert(SchemaJson.fromJson(SchemaJson.toJson(s)) == s, s"dtype $t")
    }
    assert(ScalarType.toSparkDdl(ScalarType.Complex64) == "struct<re:float,im:float>")
    assert(ScalarType.toSparkDdl(ScalarType.Complex128) == "struct<re:double,im:double>")
    assert(ScalarType.toSparkDdl(ScalarType.UInt64) == "decimal(20,0)")
    // the struct DDLs are real Spark types, not just strings
    assert(org.apache.spark.sql.types.DataType.fromDDL(
      ScalarType.toSparkDdl(ScalarType.Complex128)).simpleString ==
      "struct<re:double,im:double>")
    for (bad <- Seq(ScalarType.Float128, ScalarType.Complex256)) {
      val e = intercept[IllegalArgumentException](ScalarType.toSparkDdl(bad))
      assert(e.getMessage.contains("no faithful JVM/Parquet representation"))
    }
  }

  test("JSON uses camelCase field names") {
    val json = SchemaJson.toJson(schema)
    assert(json.contains("\"apiVersion\"") && json.contains("\"createdOn\""))
    assert(json.contains("\"sumSquares\"") && json.contains("\"chunkGrid\""))
    assert(!json.contains("api_version") && !json.contains("sum_squares"))
  }

  test("derived stats use the reference's naive formulas") {
    val s = SummaryStatistics(count = 4, sum = 8.0, sumSquares = 20.0, min = 0, max = 4)
    assert(s.mean == 2.0)
    assert(s.variance == 1.0) // 20/4 - 4
    assert(s.std == 1.0)
  }

  test("structured type rejects empty and duplicate fields") {
    intercept[IllegalArgumentException] { StructuredType(Nil) }
    intercept[IllegalArgumentException] {
      StructuredType(Seq(StructuredField("a", ScalarType.Int8),
        StructuredField("a", ScalarType.Int16)))
    }
  }
}

class TemplatesSpec extends AnyFunSuite {
  private val reg = TemplateRegistry.instance

  test("all 22 default templates are registered") {
    assert(Templates.defaults.size == 22)
    assert(reg.names.size == 22)
  }

  // Golden structure assertions mirroring tests/unit/v1/templates/
  test("PostStack3DTime golden") {
    val t = reg.get("PostStack3DTime")
    assert(t.dimNames == Seq("inline", "crossline", "time"))
    assert(t.chunkShape == Seq(128, 128, 128))
    assert(t.physicalCoords == Seq("cdp_x", "cdp_y"))
    assert(t.spatialDimNames == Seq("inline", "crossline"))
  }

  test("CdpOffsetGathers3DDepth golden") {
    val t = reg.get("CdpOffsetGathers3DDepth")
    assert(t.dimNames == Seq("inline", "crossline", "offset", "depth"))
    assert(t.chunkShape == Seq(8, 8, 32, 512))
  }

  test("StreamerFieldRecords3D golden: calculated shot_index") {
    val t = reg.get("StreamerFieldRecords3D")
    assert(t.dimNames == Seq("sail_line", "gun", "shot_index", "cable", "channel", "time"))
    assert(t.calculatedDims == Seq("shot_index"))
    assert(t.chunkShape == Seq(1, 1, 16, 1, 32, 1024))
  }

  test("ObnReceiverGathers3D golden: synthesized component") {
    val t = reg.get("ObnReceiverGathers3D")
    assert(t.synthesizeMissingDims == Seq("component"))
    assert(t.dimNames.head == "component" && t.dimNames.last == "time")
    assert(t.chunkShape == Seq(1, 1, 1, 1, 512, 4096))
  }

  test("registry rejects duplicate registration; -1 chunks expand") {
    intercept[IllegalArgumentException] {
      reg.register(reg.get("PostStack3DTime"))
    }
    val t = DatasetTemplate("X", "time", Seq("a", "time"), Seq(-1, 64))
    assert(t.fullChunkShape(Seq(345L, 1501L)) == Seq(345L, 64L))
  }
}

class ResolverSpec extends AnyFunSuite {

  test("resolve computes required fields = non-calculated spatial dims + coords") {
    val t = TemplateRegistry.instance.get("StreamerFieldRecords3D")
    val s = SchemaResolver.resolve(t)
    // shot_index is calculated → NOT required from headers
    assert(!s.requiredFields.contains("shot_index"))
    assert(s.requiredFields.contains("sail_line") && s.requiredFields.contains("channel"))
    assert(s.requiredFields.contains("shot_point")) // logical coord
  }

  test("InsertTraceDimEffect inserts trace before the vertical dim, chunk 1") {
    val s = SchemaResolver.resolve(TemplateRegistry.instance.get("PostStack3DTime"))
    val out = InsertTraceDimEffect().apply(s)
    assert(out.dimensions == Seq("inline", "crossline", "trace", "time"))
    assert(out.chunkShape == Seq(128, 128, 1, 128))
    assert(out.calculatedDims.contains("trace"))
  }

  test("CollapseToTraceEffect drops collapsed dims and re-homes them as coords") {
    val s = SchemaResolver.resolve(TemplateRegistry.instance.get("StreamerShotGathers3D"))
    val out = CollapseToTraceEffect(Seq("cable", "channel")).apply(s)
    assert(out.dimensions == Seq("shot_point", "trace", "time"))
    assert(out.coordinates.exists(c => c.name == "cable" &&
      c.dimensions == Seq("shot_point", "trace")))
    assert(out.coordinates.forall(_.dimensions == Seq("shot_point", "trace")))
    intercept[IllegalArgumentException] {
      CollapseToTraceEffect(Seq("time")).apply(s) // vertical dim
    }
  }

  test("verifyCalculatedDims fails when a calculated dim was not produced") {
    val t = TemplateRegistry.instance.get("StreamerFieldRecords3D")
    val s = SchemaResolver.resolve(t)
    SchemaResolver.verifyCalculatedDims(s, Seq("sail_line", "shot_index"))
    intercept[IllegalStateException] {
      SchemaResolver.verifyCalculatedDims(s, Seq("sail_line"))
    }
  }
}

class CoordDimOverrideSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("CDP/Coca/OffsetTiles coordinates span (inline, crossline) only") {
    val reg = TemplateRegistry.instance
    Seq("CdpOffsetGathers3DTime", "CocaGathers3DDepth", "OffsetTiles3DTime")
      .foreach { name =>
        val s = SchemaResolver.resolve(reg.get(name))
        val cdpX = s.coordinates.find(_.name == "cdp_x").get
        assert(cdpX.dimensions == Seq("inline", "crossline"), name)
      }
    val s2d = SchemaResolver.resolve(reg.get("CdpAngleGathers2DTime"))
    assert(s2d.coordinates.find(_.name == "cdp_x").get.dimensions == Seq("cdp"))
    // non-overridden templates keep the all-spatial default
    val ps = SchemaResolver.resolve(reg.get("PostStack3DTime"))
    assert(ps.coordinates.find(_.name == "cdp_x").get.dimensions ==
      Seq("inline", "crossline"))
  }
}

class SentinelsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("sentinel -> NULL on import, NULL -> sentinel on export, round-trip") {
    val df = Seq(
      (1, 10, 1.5), (2, Int.MaxValue, Double.NaN), (3, 20, 2.5))
      .toDF("id", "xline", "amp")
    val types = Map("xline" -> ScalarType.Int32, "amp" -> ScalarType.Float64)
    val nulled = Sentinels.nullifySentinels(df, types)
    val r2 = nulled.where(col("id") === 2).collect().head
    assert(r2.isNullAt(1) && r2.isNullAt(2))
    assert(nulled.where(col("id") === 1).collect().head.getInt(1) == 10)
    val back = Sentinels.materializeSentinels(nulled, types)
      .where(col("id") === 2).collect().head
    assert(back.getInt(1) == Int.MaxValue)
    assert(back.getDouble(2).isNaN)
  }

  test("unsigned widened sentinels match the reference max values") {
    assert(Sentinels.fillValue(ScalarType.UInt8) == 255.toShort)
    assert(Sentinels.fillValue(ScalarType.UInt32) == 4294967295L)
    assert(Sentinels.fillValue(ScalarType.UInt64) ==
      BigDecimal("18446744073709551615"))
  }
}
