package graft.tools

import org.apache.spark.sql.SparkSession

/** S8 `info` command surface (`commands/info.py:40-155` documented behavior,
  * implemented against our store): per-dim min/max/cardinality + sidecar
  * metadata (stats, chunk grid, attributes) as JSON on stdout.
  *
  * Usage: runMain graft.tools.Info /path/to/store
  */
object Info {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: Info <mdio-store-path>")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ds = graft.storage.MdioDataset.open(spark, args(0))
    val dimsInData = ds.schema.dimensions.map(_.name).filter(ds.df.columns.contains)
    val summary =
      if (dimsInData.nonEmpty) ds.info().toJSON.collect().headOption.getOrElse("{}")
      else "{}"
    println(s"""{"path":"${args(0)}","nRows":${ds.df.count()},""" +
      s""""gridSummary":$summary,""" +
      s""""schema":${graft.schema.SchemaJson.toJson(ds.schema)}}""")
    spark.stop()
  }
}
