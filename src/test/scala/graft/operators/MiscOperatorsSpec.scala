package graft.operators

import graft.SparkSpec
import graft.ingestion.IngestPipeline
import graft.schema.{FileHeaderAttach, UnitResolution}
import org.apache.spark.sql.functions._

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("histogram buckets with clamped edges") {
    val df = Seq(-1.0, 0.0, 4.9, 5.0, 49.9, 99.0).toDF("x")
    val got = Stats.histogram(df, "x", nBins = 10, lo = 0.0, hi = 50.0)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 1L, 9L -> 2L)) // -1 clamps low, 99 high
  }
}

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregate equals the plain aggregate") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toLong))
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Salting.saltedAgg(df, "key", sum(col("v")), "s",
        saltBuckets = 8, saltSource = Seq("v"))
      .select(col("key"), col("s").cast("long"), col("n_rows"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }
}

class MetadataHelpersSpec extends SparkSpec {

  test("C3 unit resolution: measurement system, defaults, template wins") {
    assert(UnitResolution.resolve("cdp_x", 1).contains("meter"))
    assert(UnitResolution.resolve("cdp_x", 2).contains("ft"))
    assert(UnitResolution.resolve("cdp_x", 0).isEmpty)
    assert(UnitResolution.resolve("azimuth", 1).contains("degrees"))
    assert(UnitResolution.resolve("time", 2).contains("millisecond"))
    assert(UnitResolution.resolve("cdp_x", 1, Map("cdp_x" -> "km")).contains("km"))
  }

  test("C4 vertical dim: ms labels, long when integral") {
    val ms = IngestPipeline.buildVerticalDim(spark, 4, 2000, "time")
    assert(ms.schema("time").dataType.typeName == "long")
    assert(ms.collect().map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 6L))
    val sub = IngestPipeline.buildVerticalDim(spark, 3, 500, "time")
    assert(sub.schema("time").dataType.typeName == "double")
    assert(sub.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 0.5, 1.0))
  }

  test("C5 file-header attach modes") {
    val bad = Seq("short header")
    val good = graft.`export`.SegyHeaders.sanitizeTextHeader(bad)
    assert(FileHeaderAttach.attach(Map.empty, bad, "b64",
      FileHeaderAttach.Mode.Off).isEmpty)
    intercept[graft.`export`.SegyHeaders.TextHeaderError] {
      FileHeaderAttach.attach(Map.empty, bad, "b64", FileHeaderAttach.Mode.Strict)
    }
    val lenient = FileHeaderAttach.attach(Map("k" -> "v"), bad, "b64",
      FileHeaderAttach.Mode.Lenient)
    assert(lenient("segyTextHeader") == good.mkString("\n"))
    assert(lenient("segyBinaryHeaderRaw") == "b64" && lenient("k") == "v")
    FileHeaderAttach.attach(Map.empty, good, "b64", FileHeaderAttach.Mode.Strict)
  }
}
