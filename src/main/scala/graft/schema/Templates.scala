package graft.schema

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Dataset templates — the 13 built-in kinds (22 registry instances counting
  * time/depth and offset/angle variants), as pure values.
  *
  * Mirrors `builder/templates/base.py:31-453` (template-method base) and the
  * default registrations in `builder/template_registry.py:120-156`. Dims are
  * ordered; the LAST dim is the vertical (data domain) axis. `-1` chunk
  * sizes expand to the full dim size (`templates/base.py:307-317`).
  */
final case class DatasetTemplate(
    name: String,
    dataDomain: String,                   // "time" | "depth"
    dimNames: Seq[String],                // last = vertical
    chunkShape: Seq[Int],
    physicalCoords: Seq[String] = Nil,
    logicalCoords: Seq[String] = Nil,
    calculatedDims: Seq[String] = Nil,    // produced by index strategies, not headers
    synthesizeMissingDims: Seq[String] = Nil,
    attributes: Map[String, String] = Map.empty,
    /** Coordinate → dims it spans, when NOT all spatial dims (e.g. CDP
      * gathers index cdp_x/y by (inline, crossline) only —
      * `templates/seismic_3d_cdp.py:38-43`). */
    coordDimOverrides: Map[String, Seq[String]] = Map.empty) {
  require(dataDomain == "time" || dataDomain == "depth",
    "domain must be 'depth' or 'time'") // base.py:40-42
  require(chunkShape.length == dimNames.length,
    s"Chunk shape $chunkShape has ${chunkShape.length} dimensions, expected ${dimNames.length}")

  def spatialDimNames: Seq[String] = dimNames.dropRight(1)
  def coordinateNames: Seq[String] = physicalCoords ++ logicalCoords

  /** Expand -1 chunk sizes to the full dimension size
    * (`templates/base.py:307-317`, `ingestion/dataset_factory.py:54-64`). */
  def fullChunkShape(dimSizes: Seq[Long]): Seq[Long] = {
    require(dimSizes.length == dimNames.length, "dim size per dim name required")
    chunkShape.zip(dimSizes).map { case (c, s) => if (c == -1) s else c.toLong }
  }
}

object Templates {
  private def cap(s: String) = s.capitalize

  private def postStack2D(domain: String) = DatasetTemplate(
    s"PostStack2D${cap(domain)}", domain,
    Seq("cdp", domain), Seq(1024, 1024),
    physicalCoords = Seq("cdp_x", "cdp_y"),
    attributes = Map("surveyType" -> "2D"))

  private def postStack3D(domain: String) = DatasetTemplate(
    s"PostStack3D${cap(domain)}", domain,
    Seq("inline", "crossline", domain), Seq(128, 128, 128),
    physicalCoords = Seq("cdp_x", "cdp_y"),
    attributes = Map("surveyType" -> "3D"))

  private def cdp2D(domain: String, gather: String) = DatasetTemplate(
    s"Cdp${cap(gather)}Gathers2D${cap(domain)}", domain,
    Seq("cdp", gather, domain), Seq(16, 64, 1024),
    physicalCoords = Seq("cdp_x", "cdp_y"),
    attributes = Map("surveyType" -> "2D", "gatherType" -> "cdp"),
    coordDimOverrides = Map("cdp_x" -> Seq("cdp"), "cdp_y" -> Seq("cdp")))

  private def cdp3D(domain: String, gather: String) = DatasetTemplate(
    s"Cdp${cap(gather)}Gathers3D${cap(domain)}", domain,
    Seq("inline", "crossline", gather, domain), Seq(8, 8, 32, 512),
    physicalCoords = Seq("cdp_x", "cdp_y"),
    attributes = Map("surveyType" -> "3D", "gatherType" -> "cdp"),
    coordDimOverrides = Map("cdp_x" -> Seq("inline", "crossline"),
      "cdp_y" -> Seq("inline", "crossline")))

  private def coca(domain: String) = DatasetTemplate(
    s"CocaGathers3D${cap(domain)}", domain,
    Seq("inline", "crossline", "offset", "azimuth", domain), Seq(8, 8, 32, 1, 1024),
    physicalCoords = Seq("cdp_x", "cdp_y"),
    coordDimOverrides = Map("cdp_x" -> Seq("inline", "crossline"),
      "cdp_y" -> Seq("inline", "crossline")))

  private def offsetTiles(domain: String) = DatasetTemplate(
    s"OffsetTiles3D${cap(domain)}", domain,
    Seq("inline", "crossline", "inline_offset_tile", "crossline_offset_tile", domain),
    Seq(4, 4, 6, 6, 4096),
    physicalCoords = Seq("cdp_x", "cdp_y"),
    coordDimOverrides = Map("cdp_x" -> Seq("inline", "crossline"),
      "cdp_y" -> Seq("inline", "crossline")))

  private val streamerShot2D = DatasetTemplate(
    "StreamerShotGathers2D", "time",
    Seq("shot_point", "channel", "time"), Seq(16, 32, 2048),
    physicalCoords = Seq("source_coord_x", "source_coord_y", "group_coord_x", "group_coord_y"))

  private val streamerShot3D = DatasetTemplate(
    "StreamerShotGathers3D", "time",
    Seq("shot_point", "cable", "channel", "time"), Seq(8, 1, 128, 2048),
    physicalCoords = Seq("source_coord_x", "source_coord_y", "group_coord_x", "group_coord_y"),
    logicalCoords = Seq("gun"))

  private val streamerField3D = DatasetTemplate(
    "StreamerFieldRecords3D", "time",
    Seq("sail_line", "gun", "shot_index", "cable", "channel", "time"),
    Seq(1, 1, 16, 1, 32, 1024),
    physicalCoords = Seq("source_coord_x", "source_coord_y", "group_coord_x", "group_coord_y"),
    logicalCoords = Seq("shot_point", "orig_field_record_num"),
    calculatedDims = Seq("shot_index"))

  private val receiverGathers3D = DatasetTemplate(
    "ReceiverGathers3D", "time",
    Seq("receiver", "shot_line", "shot_point", "time"), Seq(1, 1, 512, 4096),
    physicalCoords = Seq("receiver_x", "receiver_y", "source_coord_x", "source_coord_y"))

  private val obn3D = DatasetTemplate(
    "ObnReceiverGathers3D", "time",
    Seq("component", "receiver", "shot_line", "gun", "shot_index", "time"),
    Seq(1, 1, 1, 1, 512, 4096),
    physicalCoords = Seq("group_coord_x", "group_coord_y", "source_coord_x", "source_coord_y"),
    logicalCoords = Seq("shot_point", "orig_field_record_num"),
    calculatedDims = Seq("shot_index"),
    synthesizeMissingDims = Seq("component"))

  private val shotReceiverLine3D = DatasetTemplate(
    "ShotReceiverLineGathers3D", "time",
    Seq("shot_line", "shot_point", "receiver_line", "receiver", "time"),
    Seq(1, 32, 1, 32, 2048),
    physicalCoords = Seq("source_coord_x", "source_coord_y", "group_coord_x", "group_coord_y"),
    logicalCoords = Seq("orig_field_record_num"))

  /** The default registrations, in `template_registry.py:120-156` order. */
  val defaults: Seq[DatasetTemplate] =
    Seq(postStack2D("time"), postStack2D("depth"),
      postStack3D("time"), postStack3D("depth")) ++
    (for (domain <- Seq("time", "depth"); gather <- Seq("offset", "angle"))
      yield Seq(cdp3D(domain, gather), cdp2D(domain, gather))).flatten ++
    Seq(coca("time"), coca("depth"),
      receiverGathers3D,
      offsetTiles("time"), offsetTiles("depth"),
      streamerShot2D, streamerShot3D, streamerField3D,
      obn3D, shotReceiverLine3D)
}

/** Thread-safe template registry (`builder/template_registry.py:50-157`). */
final class TemplateRegistry {
  private val templates = new ConcurrentHashMap[String, DatasetTemplate]()
  Templates.defaults.foreach(t => templates.put(t.name, t))

  def register(t: DatasetTemplate): String = {
    if (templates.putIfAbsent(t.name, t) != null)
      throw new IllegalArgumentException(s"Template '${t.name}' is already registered.")
    t.name
  }
  def get(name: String): DatasetTemplate =
    Option(templates.get(name)).getOrElse(
      throw new NoSuchElementException(s"Template '$name' is not registered."))
  def contains(name: String): Boolean = templates.containsKey(name)
  def names: Seq[String] = templates.keySet.asScala.toSeq.sorted
}

object TemplateRegistry {
  /** Singleton instance, like the reference's module-level registry. */
  lazy val instance: TemplateRegistry = new TemplateRegistry
}
