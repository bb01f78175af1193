package graft.schema

/** Schema resolution: template (+ optional schema effect) → ResolvedSchema,
  * fully describing the dataset BEFORE any data is scanned.
  *
  * Mirrors `ingestion/schema/models.py:36-89` (ResolvedSchema + SchemaEffect
  * ABC), `ingestion/schema/resolver.py:28-76` (SchemaResolver), and
  * `ingestion/segy/schema_effects.py:21-133` (InsertTraceDim /
  * CollapseToTrace). Calculated-dim verification follows
  * `ingestion/segy/pipeline.py:65-87` (G11).
  */
final case class CoordinateSpec(name: String, dimensions: Seq[String],
                                dtype: ScalarType.ScalarType)

final case class ResolvedSchema(
    name: String,
    dimensions: Seq[String],              // ordered; last = vertical
    chunkShape: Seq[Int],
    coordinates: Seq[CoordinateSpec],
    calculatedDims: Seq[String],
    defaultVariable: String = "amplitude") {

  /** P1: minimal header fields = (spatial dims that are NOT calculated)
    * ∪ coordinate source fields (`ingestion/schema/models.py:55-59`). */
  def requiredFields: Set[String] =
    (dimensions.dropRight(1).toSet -- calculatedDims.toSet) ++ coordinates.map(_.name)
}

/** G10: pure metadata rewrites on the resolved schema — no data movement. */
sealed trait SchemaEffect {
  def apply(s: ResolvedSchema): ResolvedSchema
}

/** Insert a calculated `trace` dim (chunk 1) immediately before the vertical
  * dim (`schema_effects.py:21-60`). Used by duplicate-handling ingestion. */
final case class InsertTraceDimEffect(chunkSize: Int = 1) extends SchemaEffect {
  def apply(s: ResolvedSchema): ResolvedSchema = {
    require(!s.dimensions.contains("trace"), "trace dim already present")
    val (spatial, vertical) = s.dimensions.splitAt(s.dimensions.length - 1)
    val (spatialChunks, verticalChunk) = s.chunkShape.splitAt(s.chunkShape.length - 1)
    s.copy(
      dimensions = spatial ++ Seq("trace") ++ vertical,
      chunkShape = spatialChunks ++ Seq(chunkSize) ++ verticalChunk,
      calculatedDims = s.calculatedDims :+ "trace")
  }
}

/** Collapse declared non-binned spatial dims into a synthetic `trace` dim:
  * drop them from the dim list, append `trace` before the vertical dim,
  * rewrite coordinate dim lists, and re-home the collapsed dims as
  * trace-indexed coordinates (`schema_effects.py:63-133`).
  */
final case class CollapseToTraceEffect(collapsedDims: Seq[String],
                                       chunkSize: Int = 1) extends SchemaEffect {
  def apply(s: ResolvedSchema): ResolvedSchema = {
    val missing = collapsedDims.filterNot(s.dimensions.contains)
    require(missing.isEmpty, s"cannot collapse absent dims: ${missing.mkString(",")}")
    val vertical = s.dimensions.last
    require(!collapsedDims.contains(vertical), "cannot collapse the vertical dim")
    val kept = s.dimensions.filterNot(collapsedDims.contains)
    val keptChunks = s.dimensions.zip(s.chunkShape)
      .collect { case (d, c) if !collapsedDims.contains(d) => c }
    val (spatial, vert) = kept.splitAt(kept.length - 1)
    val (spatialChunks, vertChunk) = keptChunks.splitAt(keptChunks.length - 1)
    val newSpatial = spatial ++ Seq("trace")
    // every coordinate now spans the collapsed grid: rewrite dim lists
    val rewritten = s.coordinates.map(c => c.copy(dimensions = newSpatial))
    // collapsed dims become ordinary trace-indexed coordinates
    val rehomed = collapsedDims.map(d =>
      CoordinateSpec(d, newSpatial, ScalarType.Int32))
    s.copy(
      dimensions = newSpatial ++ vert,
      chunkShape = spatialChunks ++ Seq(chunkSize) ++ vertChunk,
      coordinates = rewritten ++ rehomed,
      calculatedDims = (s.calculatedDims.filterNot(collapsedDims.contains)) :+ "trace")
  }
}

/** C3 unit resolution (`ingestion/segy/coordinates.py:76-127`): spatial unit
  * from the binary-header measurement system (1 = meters, 2 = feet); angle/
  * azimuth default to degrees; template-declared units always win.
  */
object UnitResolution {
  def resolve(dimOrCoord: String, measurementSystem: Int,
              templateUnits: Map[String, String] = Map.empty): Option[String] =
    templateUnits.get(dimOrCoord).orElse {
      dimOrCoord match {
        case "angle" | "azimuth" => Some("degrees")
        case "time" => Some("millisecond")
        case "depth" | "cdp_x" | "cdp_y" | "source_coord_x" | "source_coord_y" |
             "group_coord_x" | "group_coord_y" | "receiver_x" | "receiver_y" =>
          measurementSystem match {
            case 1 => Some("meter")
            case 2 => Some("ft")
            case _ => None
          }
        case _ => None
      }
    }
}

/** C5 file-header attach (`ingestion/segy/file_headers.py:25-55`, modes
  * `core/config.py:53-60`): store the SEG-Y text + binary headers as dataset
  * attributes. `strict` fails on an invalid text header, `lenient`
  * sanitizes, `off` stores nothing.
  */
object FileHeaderAttach {
  object Mode extends Enumeration { val Off, Strict, Lenient = Value }

  def attach(attributes: Map[String, String], textHeader: Seq[String],
             binaryHeaderB64: String, mode: Mode.Value): Map[String, String] =
    mode match {
      case Mode.Off => attributes
      case Mode.Strict =>
        graft.`export`.SegyHeaders.validateTextHeader(textHeader)
        attributes +
          ("segyTextHeader" -> textHeader.mkString("\n")) +
          ("segyBinaryHeaderRaw" -> binaryHeaderB64)
      case Mode.Lenient =>
        val clean = graft.`export`.SegyHeaders.sanitizeTextHeader(textHeader)
        attributes +
          ("segyTextHeader" -> clean.mkString("\n")) +
          ("segyBinaryHeaderRaw" -> binaryHeaderB64)
    }
}

object SchemaResolver {

  /** Resolve a template into a schema, applying at most one effect
    * (`resolver.py:28-76`; composite strategies allow at most one schema
    * effect — `index_strategies.py:331-368`).
    */
  def resolve(template: DatasetTemplate,
              effect: Option[SchemaEffect] = None): ResolvedSchema = {
    val base = ResolvedSchema(
      name = template.name,
      dimensions = template.dimNames,
      chunkShape = template.chunkShape,
      coordinates = template.coordinateNames.map(c =>
        CoordinateSpec(c,
          template.coordDimOverrides.getOrElse(c, template.spatialDimNames),
          if (template.physicalCoords.contains(c)) ScalarType.Float64
          else if (c == "gun") ScalarType.UInt8
          else ScalarType.Int32)),
      calculatedDims = template.calculatedDims)
    effect.fold(base)(_.apply(base))
  }

  /** G11: after header transforms, every calculated spatial dim must actually
    * exist as a column (`ingestion/segy/pipeline.py:65-87`). */
  def verifyCalculatedDims(schema: ResolvedSchema, columns: Seq[String]): Unit = {
    val missing = schema.calculatedDims.filterNot(columns.contains)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"calculated dimensions not produced by index strategies: ${missing.mkString(", ")}")
  }
}
