package graft.schema

/** MDIO v1 schema core — pure Scala case-class mirror of the reference's
  * Pydantic models (camelCase JSON, strict fields).
  *
  * References: dataset `builder/schemas/v1/dataset.py:13-41`, variable
  * `builder/schemas/v1/variable.py:27-65`, dtype `builder/schemas/dtype.py:
  * 16-48`, dimension `builder/schemas/dimension.py:8-12`, chunk grid
  * `builder/schemas/chunk_grid.py:10-38`, compressors
  * `builder/schemas/compressors.py:20-99`, stats
  * `builder/schemas/v1/stats.py:26-71`.
  */
object ScalarType extends Enumeration {
  type ScalarType = Value
  val Bool = Value("bool")
  val Int8 = Value("int8");   val Int16 = Value("int16")
  val Int32 = Value("int32"); val Int64 = Value("int64")
  val UInt8 = Value("uint8"); val UInt16 = Value("uint16")
  val UInt32 = Value("uint32"); val UInt64 = Value("uint64")
  val Float16 = Value("float16"); val Float32 = Value("float32")
  val Float64 = Value("float64"); val Float128 = Value("float128")
  val Complex64 = Value("complex64"); val Complex128 = Value("complex128")
  val Complex256 = Value("complex256")
  val Bytes240 = Value("V240") // fixed 240-byte raw trace-header blob

  /** Spark SQL mapping (SURVEY §1.2): unsigned ints widen, sentinels → NULL.
    * Complex values (`dtype.py:16-35` declares them; the reference's
    * ingestion never produces them, but a schema carrying them must still
    * resolve) map to the natural Spark shape — a two-field struct, the
    * layout numpy itself uses (contiguous re, im). float128 and complex256
    * stay LOUD errors: the JVM and Parquet have no 128-bit float
    * representation, so any mapping would silently truncate precision the
    * schema promised.
    */
  def toSparkDdl(t: ScalarType): String = t match {
    case Bool => "boolean"
    case Int8 => "tinyint"; case Int16 => "smallint"
    case Int32 => "int";    case Int64 => "bigint"
    case UInt8 => "smallint"; case UInt16 => "int"
    case UInt32 => "bigint";  case UInt64 => "decimal(20,0)"
    case Float16 | Float32 => "float"
    case Float64 => "double"
    case Complex64 => "struct<re:float,im:float>"
    case Complex128 => "struct<re:double,im:double>"
    case Bytes240 => "binary"
    case Float128 | Complex256 => throw new IllegalArgumentException(
      s"$t has no faithful JVM/Parquet representation (no 128-bit float) — " +
        "the reference declares it but its ingestion never produces it; " +
        "re-declare the variable as float64/complex128 or keep it out of " +
        "the Spark-resolved surface")
  }
}

final case class StructuredField(name: String, format: ScalarType.ScalarType)
/** Flat (non-nested) record type — nesting rejected like
  * `converters/type_converter.py:65-67`. */
final case class StructuredType(fields: Seq[StructuredField]) {
  require(fields.nonEmpty, "StructuredType requires at least one field")
  require(fields.map(_.name).distinct.size == fields.size, "duplicate field names")
}

final case class NamedDimension(name: String, size: Long) {
  require(size > 0, s"dimension $name must have size > 0")
}

sealed trait ChunkGrid
final case class RegularChunkGrid(chunkShape: Seq[Int]) extends ChunkGrid
final case class RectilinearChunkGrid(chunkShape: Seq[Seq[Int]]) extends ChunkGrid

sealed trait Compressor
/** Blosc zstd level 5 is the reference's lossless default
  * (`compressors.py:20-26`); Parquet zstd is our physical analog. */
final case class Blosc(cname: String = "zstd", clevel: Int = 5,
                       shuffle: Option[String] = None) extends Compressor
/** ZFP lossy — modeled as quantize-then-compress (SURVEY §7.3). */
final case class Zfp(mode: String, tolerance: Option[Double] = None,
                     rate: Option[Double] = None,
                     precision: Option[Int] = None) extends Compressor

sealed trait Histogram { def counts: Seq[Long] }
final case class CenteredBinHistogram(counts: Seq[Long], binCenters: Seq[Double])
  extends Histogram
final case class EdgeDefinedHistogram(counts: Seq[Long], binEdges: Seq[Double],
                                      binWidths: Seq[Double]) extends Histogram

/** Ingestion currently writes an empty histogram (`segy/_workers.py:186-194`). */
object Histogram { val empty: Histogram = CenteredBinHistogram(Nil, Nil) }

final case class SummaryStatistics(count: Long, sum: Double, sumSquares: Double,
                                   min: Double, max: Double,
                                   histogram: Histogram = Histogram.empty) {
  // Derived stats use the reference's naive formulas (stats.py:58-71)
  def mean: Double = sum / count
  def variance: Double = sumSquares / count - mean * mean
  def std: Double = math.sqrt(variance)
}

final case class Coordinate(name: String, dimensions: Seq[String],
                            dataType: ScalarType.ScalarType,
                            unitsV1: Option[String] = None)

final case class VariableMetadata(chunkGrid: Option[ChunkGrid] = None,
                                  statsV1: Option[SummaryStatistics] = None,
                                  unitsV1: Option[String] = None)

final case class Variable(name: String, dimensions: Seq[String],
                          dataType: Either[ScalarType.ScalarType, StructuredType],
                          compressor: Option[Compressor] = None,
                          coordinates: Seq[String] = Nil,
                          metadata: Option[VariableMetadata] = None)

final case class DatasetMetadata(name: String, apiVersion: String,
                                 createdOn: String, // ISO-8601 with zone
                                 attributes: Map[String, String] = Map.empty)

/** Physical store layout, recorded in the sidecar at first write so later
  * append/region writes can validate against it (the Zarr-chunk-layout
  * analog): `partitionCols` are Hive-style directory partitions (region
  * overwrite replaces these), `sortDims` the range-cluster ordering, and
  * `sparkSchemaDdl` the full Spark schema — reads re-apply it so
  * directory-inferred partition-column types can never drift from the
  * written ones.
  */
final case class StoreLayout(sortDims: Seq[String] = Nil,
                             partitionCols: Seq[String] = Nil,
                             sparkSchemaDdl: Option[String] = None)

/** The dataset = variables + metadata (`dataset.py:34-41`). */
final case class MdioSchema(variables: Seq[Variable], metadata: DatasetMetadata,
                            dimensions: Seq[NamedDimension] = Nil,
                            layout: Option[StoreLayout] = None) {
  def variable(name: String): Option[Variable] = variables.find(_.name == name)
}
