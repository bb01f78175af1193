package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ingestion.{GridOverrides, IngestPipeline}
import graft.schema.{DatasetTemplate, MdioSchema}
import graft.storage.{MdioDataset, MdioDatasetHandle}

/** The library's front door, mirroring the reference's public `mdio` module
  * surface name-for-name (reference `src/mdio/__init__.py:7-31`): a user of
  * the reference finds every top-level entry point here under its Scala
  * name, delegating to the operator modules that implement it.
  *
  *  - `open_mdio`   → [[openMdio]]   (lazy handle + sidecar, `api/io.py:38-66`)
  *  - `to_mdio`     → [[toMdio]]     (w/w-/a/r+ modes, `api/io.py:69-107`);
  *                    the DataFrame surface is `df.write.format("mdio")`
  *  - `segy_to_mdio`→ [[segyToMdio]] (ingest pipeline, `converters/segy.py:44-80`)
  *  - `mdio_to_segy`→ [[mdioToSegy]] (masked export, `segy/mdio_to_segy.py`)
  *  - `optimize_access_patterns` → [[optimizeAccessPatterns]]
  *                    (`optimize/access_pattern.py:26-118`)
  *  - `GridOverrides` / `ResolvedSchema` → the same names in
  *    [[graft.ingestion]] / [[graft.schema]]
  *  - plus the CLI verbs `copy` ([[copyMdio]]) and `info` ([[info]]).
  */
object Mdio {

  /** S4: open a store lazily — DataFrame handle + parsed sidecar schema. */
  def openMdio(spark: SparkSession, path: String): MdioDatasetHandle =
    MdioDataset.open(spark, path)

  /** S5: write a trace table + schema sidecar with the reference's mode
    * alphabet (`w` overwrite, `w-` error-if-exists, `a` append, `r+` region
    * overwrite of the partitions present in `df`). */
  def toMdio(df: DataFrame, path: String, schema: MdioSchema,
             mode: MdioDataset.WriteMode.Value = MdioDataset.WriteMode.W,
             sortDims: Seq[String] = Nil,
             partitionDims: Seq[String] = Nil): Unit =
    MdioDataset.write(df, path, schema, mode, sortDims, partitionDims)

  /** S3 + G2–G11 + J2/J3 + A1–A3 + C1–C4: the full ingest pipeline — schema
    * resolve, index strategies, grid QC, write-pass statistics, dim and
    * coordinate tables. */
  def segyToMdio(spark: SparkSession, traces: DataFrame,
                 template: DatasetTemplate, overrides: GridOverrides,
                 path: String, ordinal: Seq[String], valueCol: String,
                 rawHeaderFields: Seq[String] = Nil): IngestPipeline.IngestResult =
    IngestPipeline.ingest(spark, traces, template, overrides, path,
      ordinal, valueCol, rawHeaderFields = rawHeaderFields)

  /** The FILE-path entry point — the reference's `segy_to_mdio` takes a URL
    * (`segy/file.py:152-186`): parse the byte stream with
    * [[graft.sources.SegyRead.readTraces]] (driver touches 3600 bytes,
    * trace ranges fan out per task) and ingest the decoded frame. Header
    * words arrive as signed 32-bit longs; `decodeSamples` maps the raw
    * payload binary to `valueCol` (e.g. `SegyRead.ibmSamples(_, n)` for
    * IBM32 files, `SegyRead.ieeeSamples(_, n)` for rev-1+ format 5).
    */
  def segyFileToMdio(spark: SparkSession, segyFile: String,
                     headerFields: Seq[String], sampleBytes: Int,
                     template: DatasetTemplate, overrides: GridOverrides,
                     path: String, ordinal: Seq[String], valueCol: String,
                     decodeSamples: Column => Column,
                     sparsityWarn: Double = 2.0, sparsityError: Double = 10.0,
                     ignoreChecks: Boolean = false,
                     rawHeaderFields: Seq[String] = Nil): IngestPipeline.IngestResult = {
    import org.apache.spark.sql.functions.col
    val traces = graft.sources.SegyRead
      .readTraces(spark, segyFile, headerFields, sampleBytes)
      .withColumn(valueCol, decodeSamples(col("samples")))
    IngestPipeline.ingest(spark, traces, template, overrides, path,
      ordinal, valueCol, sparsityWarn, sparsityError, ignoreChecks,
      rawHeaderFields)
  }

  /** The DIRECTORY entry point — a real survey is thousands of shot files
    * under one prefix, ingested as ONE dataset. Members arrive through the
    * segy DSv2 table (uniform-geometry validated, split planning per
    * (file, trace-range), `source_file` carried), samples decode per the
    * self-described format code, and the union feeds the same ingest
    * pipeline a single file would. `fields` are standard rev-1 names (the
    * DSv2 catalog); the per-file `trace_index` + `source_file` pair is the
    * ordinal, so duplicate in-file indexes across members stay distinct.
    */
  def segyDirToMdio(spark: SparkSession, segyDir: String,
                    fields: Seq[String],
                    template: DatasetTemplate, overrides: GridOverrides,
                    path: String, valueCol: String,
                    sparsityWarn: Double = 2.0, sparsityError: Double = 10.0,
                    ignoreChecks: Boolean = false): IngestPipeline.IngestResult = {
    val traces = spark.read.format("segy")
      .option("fields", fields.mkString(","))
      .load(segyDir)
      .withColumnRenamed("samples", valueCol)
    require(traces.columns.contains("source_file"),
      s"$segyDir is not a directory of SEG-Y files (single-file loads " +
        "carry no source_file; use segyFileToMdio)")
    IngestPipeline.ingest(spark, traces, template, overrides, path,
      ordinal = Seq("source_file", "trace_index"), valueCol = valueCol,
      sparsityWarn, sparsityError, ignoreChecks)
  }

  /** E1–E5: masked, globally ordered SEG-Y export of an open store. The
    * samples column must survive the header projection, so it rides the
    * `headerFields` of the masked select and is then serialized as the
    * trace payload.
    */
  def mdioToSegy(handle: MdioDatasetHandle, outFile: String, mask: Column,
                 dims: Seq[String], headerFields: Seq[String],
                 orderKeys: Seq[String], samplesCol: String,
                 textHeader: Seq[String], binaryHeader: Array[Byte]): Unit = {
    val ordered = graft.export.SegyExport.maskedExport(
      handle.df, mask, dims, (headerFields :+ samplesCol).distinct, orderKeys)
    val records = graft.export.SegyExport.serializeTraces(
      ordered, headerFields, samplesCol)
    graft.export.SegyExport.writeSegy(records, outFile, textHeader, binaryHeader)
  }

  /** [[mdioToSegy]] in the STANDARD rev-1 layout — real 240-byte trace
    * headers at spec offsets and a self-describing binary header, so the
    * output opens in any SEG-Y tool (and in [[graft.sources.SegyRead
    * .readStandardTraces]]). `samplesCol` must hold float samples of fixed
    * length `nSamples`; they encode as format-1 IBM32 through the native
    * kernel.
    */
  def mdioToStandardSegy(handle: MdioDatasetHandle, outFile: String,
                         mask: Column,
                         dims: Seq[String],
                         fieldCols: Seq[(graft.sources.SegyRead.HeaderField, String)],
                         orderKeys: Seq[String], samplesCol: String,
                         nSamples: Int, sampleInterval: Int,
                         textHeader: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val headerCols = fieldCols.map(_._2)
    val ordered = graft.export.SegyExport.maskedExport(
      handle.df, mask, dims, (headerCols :+ samplesCol).distinct, orderKeys)
    val records = graft.export.SegyExport.serializeStandardTraces(
      ordered.withColumn("_pay",
        graft.export.SegyExport.ibmPayload(col(samplesCol), nSamples)),
      fieldCols, "_pay")
    graft.export.SegyExport.writeSegy(records, outFile, textHeader,
      graft.export.SegyExport.standardBinaryHeader(nSamples, sampleInterval,
        formatCode = 1))
  }

  /** O1: materialize `fast_<dim>` clustered (optionally quantized) copies
    * and register them so [[graft.plans.AccessPatternRule]] swaps scans. */
  def optimizeAccessPatterns(handle: MdioDatasetHandle, dims: Seq[String],
                             variable: String, quality: Double = 0.0): Double = {
    val tol =
      if (quality > 0.0)
        graft.operators.AccessPatterns.optimizeStore(handle, dims, variable, quality)
      else {
        graft.operators.AccessPatterns.optimize(handle.df, handle.path, dims)
        0.0
      }
    dims.foreach { d =>
      graft.plans.AccessPatternCatalog.register(s"${handle.path}/data", d,
        graft.operators.AccessPatterns.fastTablePath(handle.path, d))
    }
    tol
  }

  /** Maintenance: fold append-accumulated micro-batch files back into the
    * sidecar-recorded layout (row-identical; safe between stream triggers).
    * The reference's rechunking analog is `optimize/access_pattern.py:26-118`.
    * Returns the parquet file counts (before, after). */
  def compactMdio(spark: SparkSession, path: String): (Int, Int) =
    MdioDataset.compact(spark, path)

  /** S7: store→store copy with optional column pruning. */
  def copyMdio(spark: SparkSession, from: String, to: String,
               excludeColumns: Seq[String] = Nil): Unit =
    MdioDataset.copy(spark, from, to, excludeColumns)

  /** S8: per-dim min/max/cardinality + sidecar metadata. */
  def info(spark: SparkSession, path: String): DataFrame =
    openMdio(spark, path).info()
}
