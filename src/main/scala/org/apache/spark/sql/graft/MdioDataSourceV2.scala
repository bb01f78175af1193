package org.apache.spark.sql.graft

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsDynamicOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.{DataSourceRegister, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 surface for MDIO stores, symmetric read/write like the
  * reference's `to_mdio`/`open_mdio` (`api/io.py:38-107`):
  * `spark.read.format("mdio").load(path)` and
  * `df.write.format("mdio").mode(...).save(path)` (registered via
  * META-INF/services, so the short name works anywhere — SQL `USING mdio`
  * with `INSERT INTO`, the DataFrame API, other sessions).
  *
  * Reads: the schema comes from the store's `.mdio.json` sidecar (the Spark
  * DDL recorded at write time — partition-column types can never drift), and
  * the scan delegates to the builtin Parquet DSv2 table over `<path>/data`,
  * so predicate pushdown, column pruning, partition pruning and vectorized
  * reading are all the native ones.
  *
  * Writes: the V1 fallback ([[V1Write]] → [[InsertableRelation]]) delegates
  * to [[graft.storage.MdioDataset.write]], so sidecar maintenance, layout
  * and schema-drift validation live in ONE code path. Mode mapping mirrors
  * `to_mdio`: SaveMode.Append → `a` (creating the store if absent — Zarr
  * `a` semantics), SaveMode.Overwrite → `w`, or `r+` (region overwrite of
  * the partitions present in the frame) when `partitionOverwriteMode` is
  * `dynamic` (write option or session conf). Options `sortDims` /
  * `partitionDims` (comma-separated) set the layout of a fresh store;
  * appends inherit and validate against the recorded layout.
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
        s"$path is not an MDIO store (no .mdio.json sidecar); create it " +
          "with MdioDataset.write or CREATE TABLE (cols...) USING mdio"))
    sidecar.layout.flatMap(_.sparkSchemaDdl) match {
      case Some(ddl) => StructType.fromDDL(ddl)
      case None      => spark.read.parquet(s"$path/data").schema // pre-layout store
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = storePath(options)
    new MdioTable(path, schema,
      ParquetTable(s"mdio $path", SparkSession.active, options,
        Seq(s"$path/data"), Some(schema), classOf[ParquetFileFormat]))
  }
}

/** The mdio table: reads delegate to the builtin Parquet DSv2 scan (all
  * native pushdown/pruning); writes fall back to V1 so they run through
  * [[graft.storage.MdioDataset.write]]'s sidecar + validation.
  */
private[graft] class MdioTable(path: String, tableSchema: StructType,
                               delegate: ParquetTable)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"mdio $path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    // BATCH_WRITE is required by DataFrameWriter's capability gate; the
    // planner still picks the V1 exec because build() returns a V1Write
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_DYNAMIC)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MdioWriteBuilder(path, info)
}

/** Append by default; `truncate()` (DataFrameWriter SaveMode.Overwrite)
  * maps to `w`, or `r+` under dynamic partition-overwrite; INSERT OVERWRITE
  * with dynamic mode hits [[overwriteDynamicPartitions]] → `r+` directly.
  */
private class MdioWriteBuilder(path: String, info: LogicalWriteInfo)
  extends WriteBuilder with SupportsTruncate with SupportsDynamicOverwrite {

  import graft.storage.MdioDataset
  import graft.storage.MdioDataset.WriteMode

  private var requested: Option[WriteMode.Value] = None // None → append/create

  private def dynamicConf: Boolean =
    Option(info.options.get("partitionOverwriteMode"))
      .getOrElse(SparkSession.active.conf
        .get("spark.sql.sources.partitionOverwriteMode", "static"))
      .equalsIgnoreCase("dynamic")

  override def truncate(): WriteBuilder = {
    requested = Some(if (dynamicConf) WriteMode.RPlus else WriteMode.W)
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    requested = Some(WriteMode.RPlus)
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, overwrite: Boolean): Unit = {
        val spark = data.sparkSession
        val existing = MdioDataset.readSidecar(spark, path)
        val mode = requested.getOrElse {
          if (overwrite) WriteMode.W
          else if (existing.isDefined) WriteMode.A
          else WriteMode.W // first insert creates the store (Zarr 'a' semantics)
        }
        def dims(key: String): Option[Seq[String]] =
          Option(info.options.get(key))
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        val layout = existing.flatMap(_.layout)
        val sortDims = dims("sortDims")
          .orElse(layout.map(_.sortDims)).getOrElse(Nil)
        val partitionDims = dims("partitionDims")
          .orElse(layout.map(_.partitionCols)).getOrElse(Nil)
        // keep the recorded dataset metadata on rewrites; synthesize a
        // minimal sidecar for a store born through the SQL/DataFrame surface
        val schema = existing.getOrElse(graft.schema.MdioSchema(
          variables = Nil,
          metadata = graft.schema.DatasetMetadata(
            new org.apache.hadoop.fs.Path(path).getName, "1.0.0",
            java.time.Instant.now().toString)))
        MdioDataset.write(data, path, schema, mode, sortDims, partitionDims)
      }
    }
  }
}
