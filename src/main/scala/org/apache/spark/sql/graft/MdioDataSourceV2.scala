package org.apache.spark.sql.graft

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 read surface for MDIO stores: `spark.read.format("mdio")
  * .load(storePath)` (registered via META-INF/services, so the short name
  * works anywhere — SQL `USING mdio`, the DataFrame API, other sessions).
  *
  * The schema comes from the store's `.mdio.json` sidecar (the Spark DDL
  * recorded at write time — partition-column types can never drift), and the
  * scan delegates to the builtin Parquet DSv2 table over `<path>/data`, so
  * predicate pushdown, column pruning, partition pruning and vectorized
  * reading are all the native ones. Writes go through
  * [[graft.storage.MdioDataset.write]], which owns sidecar + layout
  * validation — this provider is deliberately read-only.
  *
  * Lives in `org.apache.spark.sql.graft` because the delegated
  * `ParquetTable` is `private[sql]`.
  */
class MdioDataSourceV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "mdio"
  override def supportsExternalMetadata(): Boolean = true

  private def storePath(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "mdio format requires a store path: spark.read.format(\"mdio\").load(path)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = storePath(options)
    val sidecar = graft.storage.MdioDataset.readSidecar(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"$path is not an MDIO store (no .mdio.json sidecar)"))
    sidecar.layout.flatMap(_.sparkSchemaDdl) match {
      case Some(ddl) => StructType.fromDDL(ddl)
      case None      => spark.read.parquet(s"$path/data").schema // pre-layout store
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = storePath(options)
    ParquetTable(s"mdio $path", SparkSession.active, options,
      Seq(s"$path/data"), Some(schema), classOf[ParquetFileFormat])
  }
}
