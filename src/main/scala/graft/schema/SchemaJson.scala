package graft.schema

import org.json4s._
import org.json4s.jackson.JsonMethods

/** camelCase JSON codec for the MDIO v1 schema sidecar — hand-rolled over the
  * json4s AST (ships with Spark) so field names match the reference's strict
  * camelCase serialization (`builder/schemas/core.py:10-19`) exactly.
  * Round-trip tested like `tests/unit/v1/test_dataset_serializer.py`.
  */
object SchemaJson {

  // ------------------------------------------------------------- writers

  private def jChunkGrid(g: ChunkGrid): JValue = g match {
    case RegularChunkGrid(shape) => JObject(
      "name" -> JString("regular"),
      "configuration" -> JObject("chunkShape" -> JArray(shape.map(JInt(_)).toList)))
    case RectilinearChunkGrid(shape) => JObject(
      "name" -> JString("rectilinear"),
      "configuration" -> JObject(
        "chunkShape" -> JArray(shape.map(s => JArray(s.map(JInt(_)).toList)).toList)))
  }

  private def jCompressor(c: Compressor): JValue = c match {
    case Blosc(cname, clevel, shuffle) => JObject(List(
      "name" -> JString("blosc"), "cname" -> JString(cname),
      "clevel" -> JInt(clevel)) ++ shuffle.map(s => "shuffle" -> JString(s)))
    case Zfp(mode, tol, rate, prec) => JObject(List(
      "name" -> JString("zfp"), "mode" -> JString(mode)) ++
      tol.map(t => "tolerance" -> JDouble(t)) ++
      rate.map(r => "rate" -> JDouble(r)) ++
      prec.map(p => "precision" -> JInt(p)))
  }

  private def jHistogram(h: Histogram): JValue = h match {
    case CenteredBinHistogram(counts, centers) => JObject(
      "counts" -> JArray(counts.map(JInt(_)).toList),
      "binCenters" -> JArray(centers.map(JDouble).toList))
    case EdgeDefinedHistogram(counts, edges, widths) => JObject(
      "counts" -> JArray(counts.map(JInt(_)).toList),
      "binEdges" -> JArray(edges.map(JDouble).toList),
      "binWidths" -> JArray(widths.map(JDouble).toList))
  }

  private def jStats(s: SummaryStatistics): JValue = JObject(
    "count" -> JInt(s.count), "sum" -> JDouble(s.sum),
    "sumSquares" -> JDouble(s.sumSquares),
    "min" -> JDouble(s.min), "max" -> JDouble(s.max),
    "histogram" -> jHistogram(s.histogram))

  private def jDataType(dt: Either[ScalarType.ScalarType, StructuredType]): JValue =
    dt match {
      case Left(s) => JString(s.toString)
      case Right(st) => JObject("fields" -> JArray(st.fields.map(f =>
        JObject("name" -> JString(f.name), "format" -> JString(f.format.toString))).toList))
    }

  private def jVariable(v: Variable): JValue = JObject(List(
    "name" -> JString(v.name),
    "dimensions" -> JArray(v.dimensions.map(JString).toList),
    "dataType" -> jDataType(v.dataType)) ++
    v.compressor.map(c => "compressor" -> jCompressor(c)) ++
    (if (v.coordinates.nonEmpty)
      List("coordinates" -> JArray(v.coordinates.map(JString).toList)) else Nil) ++
    v.metadata.map(m => "metadata" -> JObject(
      m.chunkGrid.map(g => "chunkGrid" -> jChunkGrid(g)).toList ++
      m.statsV1.map(s => "statsV1" -> jStats(s)).toList ++
      m.unitsV1.map(u => "unitsV1" -> JString(u)).toList)))

  private def jLayout(l: StoreLayout): JValue = JObject(List(
    "sortDims" -> JArray(l.sortDims.map(JString).toList),
    "partitionCols" -> JArray(l.partitionCols.map(JString).toList)) ++
    l.sparkSchemaDdl.map(d => "sparkSchemaDdl" -> JString(d)))

  def toJson(s: MdioSchema): String = {
    val j = JObject(List(
      "variables" -> JArray(s.variables.map(jVariable).toList),
      "metadata" -> JObject(List(
        "name" -> JString(s.metadata.name),
        "apiVersion" -> JString(s.metadata.apiVersion),
        "createdOn" -> JString(s.metadata.createdOn)) ++
        (if (s.metadata.attributes.nonEmpty)
          List("attributes" -> JObject(
            s.metadata.attributes.toList.sortBy(_._1).map { case (k, v) => k -> JString(v) }))
        else Nil)),
      "dimensions" -> JArray(s.dimensions.map(d =>
        JObject("name" -> JString(d.name), "size" -> JInt(d.size))).toList)) ++
      s.layout.map(l => "layout" -> jLayout(l)))
    JsonMethods.pretty(JsonMethods.render(j))
  }

  // ------------------------------------------------------------- readers

  private def str(j: JValue): String = j match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }
  private def num(j: JValue): Double = j match {
    case JDouble(d) => d; case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble; case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }
  private def lng(j: JValue): Long = j match {
    case JInt(i) => i.toLong; case JLong(l) => l
    case other => throw new IllegalArgumentException(s"expected int, got $other")
  }

  private def pChunkGrid(j: JValue): ChunkGrid = {
    val shape = j \ "configuration" \ "chunkShape"
    str(j \ "name") match {
      case "regular" =>
        RegularChunkGrid((shape: @unchecked) match {
          case JArray(xs) => xs.map(x => lng(x).toInt)
        })
      case "rectilinear" =>
        RectilinearChunkGrid((shape: @unchecked) match {
          case JArray(xs) => xs.map { case JArray(ys) => ys.map(y => lng(y).toInt)
                                      case other => throw new IllegalArgumentException(s"$other") }
        })
      case other => throw new IllegalArgumentException(s"unknown chunk grid: $other")
    }
  }

  private def pCompressor(j: JValue): Compressor = str(j \ "name") match {
    case "blosc" => Blosc(str(j \ "cname"), lng(j \ "clevel").toInt,
      (j \ "shuffle").toOption.map(str))
    case "zfp" => Zfp(str(j \ "mode"),
      (j \ "tolerance").toOption.map(num),
      (j \ "rate").toOption.map(num),
      (j \ "precision").toOption.map(x => lng(x).toInt))
    case other => throw new IllegalArgumentException(s"unknown compressor: $other")
  }

  private def pHistogram(j: JValue): Histogram = {
    val counts = (j \ "counts") match {
      case JArray(xs) => xs.map(lng); case _ => Nil
    }
    (j \ "binEdges") match {
      case JArray(edges) =>
        val widths = (j \ "binWidths") match { case JArray(w) => w.map(num); case _ => Nil }
        EdgeDefinedHistogram(counts, edges.map(num), widths)
      case _ =>
        val centers = (j \ "binCenters") match { case JArray(c) => c.map(num); case _ => Nil }
        CenteredBinHistogram(counts, centers)
    }
  }

  private def pStats(j: JValue): SummaryStatistics = SummaryStatistics(
    lng(j \ "count"), num(j \ "sum"), num(j \ "sumSquares"),
    num(j \ "min"), num(j \ "max"), pHistogram(j \ "histogram"))

  private def pDataType(j: JValue): Either[ScalarType.ScalarType, StructuredType] =
    j match {
      case JString(s) => Left(ScalarType.withName(s))
      case obj: JObject => Right(StructuredType((obj \ "fields") match {
        case JArray(fs) => fs.map(f =>
          StructuredField(str(f \ "name"), ScalarType.withName(str(f \ "format"))))
        case other => throw new IllegalArgumentException(s"bad fields: $other")
      }))
      case other => throw new IllegalArgumentException(s"bad dataType: $other")
    }

  private def pVariable(j: JValue): Variable = Variable(
    name = str(j \ "name"),
    dimensions = (j \ "dimensions") match {
      case JArray(ds) => ds.map(str); case _ => Nil
    },
    dataType = pDataType(j \ "dataType"),
    compressor = (j \ "compressor").toOption.map(pCompressor),
    coordinates = (j \ "coordinates") match {
      case JArray(cs) => cs.map(str); case _ => Nil
    },
    metadata = (j \ "metadata").toOption.map { m =>
      VariableMetadata(
        chunkGrid = (m \ "chunkGrid").toOption.map(pChunkGrid),
        statsV1 = (m \ "statsV1").toOption.map(pStats),
        unitsV1 = (m \ "unitsV1").toOption.map(str))
    })

  def fromJson(s: String): MdioSchema = {
    val j = JsonMethods.parse(s)
    MdioSchema(
      variables = (j \ "variables") match {
        case JArray(vs) => vs.map(pVariable); case _ => Nil
      },
      metadata = {
        val m = j \ "metadata"
        DatasetMetadata(str(m \ "name"), str(m \ "apiVersion"), str(m \ "createdOn"),
          (m \ "attributes") match {
            case JObject(fields) => fields.map { case (k, v) => k -> str(v) }.toMap
            case _ => Map.empty
          })
      },
      dimensions = (j \ "dimensions") match {
        case JArray(ds) => ds.map(d => NamedDimension(str(d \ "name"), lng(d \ "size")))
        case _ => Nil
      },
      layout = (j \ "layout").toOption.collect { case l: JObject =>
        StoreLayout(
          sortDims = (l \ "sortDims") match {
            case JArray(xs) => xs.map(str); case _ => Nil
          },
          partitionCols = (l \ "partitionCols") match {
            case JArray(xs) => xs.map(str); case _ => Nil
          },
          sparkSchemaDdl = (l \ "sparkSchemaDdl").toOption.map(str))
      })
  }
}
