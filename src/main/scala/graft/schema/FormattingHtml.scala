package graft.schema

/** Notebook HTML reprs for datasets, templates, and the template registry —
  * the Spark-side analog of the reference's `builder/formatting_html.py`
  * (container + metadata grid + collapsible `<details>` tables; see
  * `formatting_html.py:186-253` for the dataset shape, `:255-326` for the
  * template shape, `:328-364` for the registry shape). Pure string
  * rendering over the sidecar schema values — no Spark job runs; sizes and
  * stats come from what the store already recorded.
  */
object FormattingHtml {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private val containerStyle =
    "font-family:system-ui,sans-serif;border:1px solid #ddd;border-radius:6px;" +
      "max-width:48em;margin:4px 0"
  private val headerStyle =
    "padding:6px 10px;background:#f5f5f5;border-bottom:1px solid #ddd;" +
      "font-weight:600"
  private val tableStyle = "border-collapse:collapse;width:100%"
  private val cellStyle = "padding:2px 10px;text-align:left;" +
    "border-bottom:1px solid #eee;font-size:0.9em"

  private def table(id: String, headers: Seq[String],
                    rows: Seq[Seq[String]]): String = {
    val head = headers.map(h => s"""<th style="$cellStyle">${esc(h)}</th>""")
      .mkString
    val body =
      if (rows.isEmpty)
        s"""<tr><td style="$cellStyle" colspan="${headers.size}"><i>none</i></td></tr>"""
      else rows.map(r =>
        "<tr>" + r.map(c => s"""<td style="$cellStyle">${esc(c)}</td>""").mkString +
          "</tr>").mkString
    s"""<table id="$id" style="$tableStyle"><thead><tr>$head</tr></thead><tbody>$body</tbody></table>"""
  }

  private def details(title: String, content: String, open: Boolean): String =
    s"""<details${if (open) " open" else ""}><summary style="padding:4px 10px;cursor:pointer">${esc(title)}</summary>$content</details>"""

  private def metadataGrid(items: Seq[(String, String)]): String =
    items.map { case (k, v) =>
      s"""<div style="padding:2px 10px;font-size:0.9em"><b>${esc(k)}:</b> ${esc(v)}</div>"""
    }.mkString

  private def container(title: String, content: String): String =
    s"""<div style="$containerStyle"><div style="$headerStyle">${esc(title)}</div>$content</div>"""

  private def typeName(dt: Either[ScalarType.ScalarType, StructuredType]): String =
    dt match {
      case Left(s)  => s.toString
      case Right(t) => s"struct[${t.fields.size}]"
    }

  /** Dataset repr: metadata grid + dimensions / coordinates / variables
    * `<details>` tables (`formatting_html.py:186-253`). Coordinate rows
    * are the union of every variable's declared coordinate names, with
    * dims looked up from a same-named variable when one exists.
    */
  def datasetReprHtml(schema: MdioSchema): String = {
    val meta = metadataGrid(Seq(
      "Name" -> schema.metadata.name,
      "API Version" -> schema.metadata.apiVersion,
      "Created" -> schema.metadata.createdOn) ++
      schema.metadata.attributes.toSeq.sortBy(_._1))
    val dimRows = schema.dimensions.map(d => Seq(d.name, d.size.toString))
    val coordNames = schema.variables.flatMap(_.coordinates).distinct
    val coordRows = coordNames.map { c =>
      val asVar = schema.variable(c)
      Seq(c, asVar.map(_.dimensions.mkString(", ")).getOrElse("—"),
        asVar.map(v => typeName(v.dataType)).getOrElse("—"))
    }
    val varRows = schema.variables.map { v =>
      val stats = v.metadata.flatMap(_.statsV1)
        .map(s => f"n=${s.count} mean=${s.mean}%.4g std=${s.std}%.4g")
        .getOrElse("—")
      Seq(v.name, v.dimensions.mkString(", "), typeName(v.dataType),
        v.compressor.map {
          case Blosc(cname, clevel, _) => s"blosc($cname, $clevel)"
          case Zfp(mode, tol, _, _) => s"zfp($mode${tol.fold("")(t => s", tol=$t")})"
        }.getOrElse("—"),
        stats)
    }
    container(s"MDIO Dataset: ${schema.metadata.name}",
      meta +
        details(s"Dimensions (${dimRows.size})",
          table("dataset-dimensions", Seq("Name", "Size"), dimRows), open = true) +
        details(s"Coordinates (${coordRows.size})",
          table("dataset-coordinates", Seq("Name", "Dimensions", "Type"), coordRows),
          open = false) +
        details(s"Variables (${varRows.size})",
          table("dataset-variables",
            Seq("Name", "Dimensions", "Type", "Compressor", "Stats"), varRows),
          open = false))
  }

  /** Template repr (`formatting_html.py:255-326`): dims with chunk sizes
    * (−1 rendered as "full"), coordinates with their spanning dims, and
    * the template attributes.
    */
  def templateReprHtml(t: DatasetTemplate): String = {
    val meta = metadataGrid(Seq(
      "Name" -> t.name,
      "Data Domain" -> t.dataDomain) ++ t.attributes.toSeq.sortBy(_._1))
    val dimRows = t.dimNames.zip(t.chunkShape).map { case (d, c) =>
      Seq(d, if (c == -1) "full" else c.toString,
        if (d == t.dimNames.last) "vertical" else "spatial")
    }
    val coordRows = t.coordinateNames.map { c =>
      Seq(c, t.coordDimOverrides.getOrElse(c, t.spatialDimNames).mkString(", "),
        if (t.physicalCoords.contains(c)) "physical" else "logical")
    }
    container(s"Template: ${t.name}",
      meta +
        details(s"Dimensions (${dimRows.size})",
          table("template-dimensions", Seq("Name", "Chunk", "Role"), dimRows),
          open = true) +
        details(s"Coordinates (${coordRows.size})",
          table("template-coordinates", Seq("Name", "Dimensions", "Kind"), coordRows),
          open = false))
  }

  /** Registry repr (`formatting_html.py:328-364`): one row per registered
    * template with its dims and domain.
    */
  def registryReprHtml(registry: TemplateRegistry = TemplateRegistry.instance)
      : String = {
    val rows = registry.names.map { n =>
      val t = registry.get(n)
      Seq(n, t.dataDomain, t.dimNames.mkString(", "),
        t.chunkShape.map(c => if (c == -1) "full" else c.toString).mkString("×"))
    }
    container(s"Template Registry (${rows.size})",
      table("registry-templates",
        Seq("Name", "Domain", "Dimensions", "Chunks"), rows))
  }
}
