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

  test("AQE splits a skewed sort-merge join at runtime (the join-side skew story)") {
    // salting covers aggregation skew; joins rely on AQE's skew handling —
    // prove our session settings actually trigger it on a pathological key
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries ~99% of the fact side
      val fact = (1 to 200000).map(i => (if (i % 100 == 0) (i % 50).toLong else 0L,
        s"payload_$i")).toDF("k", "payload")
      val dim = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = fact.join(dim, "k")
      // collect() finalizes THIS dataset's adaptive plan (count() would plan
      // a separate query execution and leave this one unfinalized)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"expected a skew-split join in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
