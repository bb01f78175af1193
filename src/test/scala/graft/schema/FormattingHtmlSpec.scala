package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** HTML reprs render from sidecar values alone (no session): structure,
  * escaping, and the three surfaces the reference exposes
  * (`builder/formatting_html.py:186,255,328`).
  */
class FormattingHtmlSpec extends AnyFunSuite {

  private val schema = MdioSchema(
    variables = Seq(
      Variable("amplitude", Seq("inline", "crossline", "time"),
        Left(ScalarType.Float32), compressor = Some(Blosc()),
        coordinates = Seq("cdp_x", "cdp_y"),
        metadata = Some(VariableMetadata(statsV1 = Some(
          SummaryStatistics(100, 50.0, 125.0, -3.0, 7.5))))),
      Variable("cdp_x", Seq("inline", "crossline"), Left(ScalarType.Float64)),
      Variable("cdp_y", Seq("inline", "crossline"), Left(ScalarType.Float64))),
    metadata = DatasetMetadata("survey <A&B>", "1.0.0",
      "2026-08-13T00:00:00Z", attributes = Map("surveyType" -> "3D")),
    dimensions = Seq(NamedDimension("inline", 10),
      NamedDimension("crossline", 10), NamedDimension("time", 500)))

  test("dataset repr: container + metadata + three details tables") {
    val html = MdioDatasetHandleReprCheck.render(schema)
    assert(html.startsWith("<div"))
    // metadata name is HTML-escaped, never raw
    assert(html.contains("survey &lt;A&amp;B&gt;"))
    assert(!html.contains("survey <A&B>"))
    assert(html.contains("Dimensions (3)"))
    assert(html.contains("Coordinates (2)"))
    assert(html.contains("Variables (3)"))
    // dim rows carry sizes; variable rows carry stats + compressor
    assert(html.contains("crossline") && html.contains("500"))
    assert(html.contains("blosc(zstd, 5)"))
    assert(html.contains("n=100"))
    // coordinate dims resolved from the same-named variable
    assert(html.contains("inline, crossline"))
  }

  test("template repr: chunk -1 renders as full; vertical dim marked") {
    val t = TemplateRegistry.instance.get("PostStack3DTime")
    val html = FormattingHtml.templateReprHtml(t)
    assert(html.contains("Template: PostStack3DTime"))
    assert(html.contains("vertical"))
    assert(html.contains("physical"))
    val fullT = t.copy(chunkShape = Seq(128, 128, -1))
    assert(FormattingHtml.templateReprHtml(fullT).contains("full"))
  }

  test("registry repr: one row per registered template") {
    val html = FormattingHtml.registryReprHtml()
    val names = TemplateRegistry.instance.names
    assert(html.contains(s"Template Registry (${names.size})"))
    names.foreach(n => assert(html.contains(n)))
  }

  test("empty coordinate/variable tables render a none row, not broken html") {
    val bare = MdioSchema(
      variables = Seq(Variable("v", Seq("x"), Left(ScalarType.Int32))),
      metadata = DatasetMetadata("bare", "1.0.0", "2026-08-13T00:00:00Z"),
      dimensions = Nil)
    val html = FormattingHtml.datasetReprHtml(bare)
    assert(html.contains("<i>none</i>"))
    assert(html.contains("Variables (1)"))
  }
}

/** Renders through the same function the handle's `reprHtml` calls — kept
  * session-free so this spec needs no SparkSession. */
private object MdioDatasetHandleReprCheck {
  def render(s: MdioSchema): String = FormattingHtml.datasetReprHtml(s)
}
