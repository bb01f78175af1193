package graft.sources

import java.io.RandomAccessFile
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FOREIGN survey end to end, parameterized by survey geometry — the
  * reference's own integration anchor is a full 3-D survey ingest →
  * selection → export → byte-compare (`tests/integration/
  * test_segy_roundtrip_teapot.py:151-310`); the committed golden files
  * kill complementary-bug risk at 25 traces, these specs do it at survey
  * scale. The fixture is synthesized AT TEST TIME by the independent
  * Python encoder (`tools/gen_big_segy.py`, never committed); every
  * sample obeys one closed-form formula, so any region byte-checks
  * without trusting either writer.
  *
  * Two tiers share this body: [[SurveyIntegrationSmokeSpec]] (~77 MB,
  * always on — every `sbt test` and driver round exercises the full
  * chain) and [[BigSurveyIntegrationSpec]] (~1 GiB, nightly-class behind
  * `SPARK_GRAFT_BIG_FIXTURE=1`).
  */
abstract class SurveyIntegrationBase extends SparkSpec {

  private val il0 = 2000
  private val xl0 = 500

  /** The generator's closed form, reimplemented independently. */
  private def v(il: Int, xl: Int, j0: Int): Float =
    (((il * 31 + xl * 7 + j0) % 65536) - 32768 + 0.5).toFloat

  protected def runSurveyIntegration(nIl: Int, nXl: Int, ns: Int): Unit = {
    // the foreign-encoder fixture needs python3 on PATH; CANCEL (not
    // fail) on machines without it — same green-or-canceled contract as
    // the env-gated GB tier
    assume(
      try new ProcessBuilder("python3", "--version").start().waitFor() == 0
      catch { case _: java.io.IOException => false },
      "python3 not available — skipping the foreign-survey tier")
    val dir = Files.createTempDirectory("bigsurvey").toString
    val f = s"$dir/big.sgy"
    val gen = new ProcessBuilder("python3", "tools/gen_big_segy.py", f,
      nIl.toString, nXl.toString, ns.toString)
      .directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
      .inheritIO().start()
    assert(gen.waitFor() == 0, "fixture generator failed")
    val expectedBytes = 3600L + nIl.toLong * nXl * (240L + 4L * ns)
    assert(new java.io.File(f).length() == expectedBytes)

    // ---- S1/S2: standard reader over the foreign bytes -----------------
    val df = spark.read.format("segy")
      .option("fields", "inline,crossline").load(f)

    // grid shape in ONE action
    val g = df.agg(
      count(lit(1)).as("n"),
      countDistinct(col("inline")).as("nil"),
      countDistinct(col("crossline")).as("nxl"),
      min(col("inline")).as("il_min"), max(col("inline")).as("il_max"),
      min(col("crossline")).as("xl_min"), max(col("crossline")).as("xl_max"))
      .head()
    assert(g.getLong(0) == nIl.toLong * nXl)
    assert(g.getLong(1) == nIl && g.getLong(2) == nXl)
    assert(g.getLong(3) == il0 && g.getLong(4) == il0 + nIl - 1)
    assert(g.getLong(5) == xl0 && g.getLong(6) == xl0 + nXl - 1)

    // decoded amplitudes vs the closed form at edge/interior positions for
    // EVERY trace (distributed; zero rows may disagree). The later export
    // byte-compare re-checks full payloads on sampled traces.
    def expected(p: Int): org.apache.spark.sql.Column =
      (((col("inline") * 31 + col("crossline") * 7 + (p - 1)) % 65536)
        - 32768 + lit(0.5)).cast("float")
    val probes = Seq(1, ns / 2, ns)
    val bad = df.where(probes.map(p =>
      element_at(col("samples"), p) =!= expected(p)).reduce(_ || _)).count()
    assert(bad == 0, s"$bad traces disagree with the closed form")

    // ---- S4/S5 + P3: store the decoded frame, select a label box -------
    import graft.schema._
    import graft.storage.MdioDataset
    val store = s"$dir/store"
    val schema = MdioSchema(
      variables = Seq(Variable("samples", Seq("inline", "crossline", "time"),
        Left(ScalarType.Float32))),
      metadata = DatasetMetadata("big-survey", "1.0.0", "2026-01-01T00:00:00Z"))
    MdioDataset.write(df.select("inline", "crossline", "samples"), store,
      schema, sortDims = Seq("inline", "crossline"))
    val h = MdioDataset.open(spark, store)
    val selIl = il0 + math.min(100, nIl / 2)
    val sel = h.sel("inline" -> graft.operators.Selection.Range(selIl, selIl + 9))
    val selAgg = sel.agg(count(lit(1)).as("n"),
      countDistinct(col("inline")).as("nil")).head()
    assert(selAgg.getLong(0) == 10L * nXl && selAgg.getLong(1) == 10L)

    // ---- E-family: export the selected box, standard format 5 ----------
    val out = s"$dir/box.sgy"
    sel.select(col("inline").cast("int").as("inline"),
        col("crossline").cast("int").as("crossline"), col("samples"))
      .write.format("segy").option("fields", "inline,crossline")
      .option("formatCode", "5").mode("overwrite").save(out)
    val raf = new RandomAccessFile(out, "r")
    try {
      val traceBytes = 240L + 4L * ns
      val nTraces = ((raf.length() - 3600) / traceBytes).toInt
      assert(raf.length() == 3600 + nTraces * traceBytes)
      assert(nTraces == 10 * nXl)
      // byte-compare sampled traces: header (il, xl) words at the spec
      // offsets, then the FULL payload against (a) the closed form packed
      // big-endian by the JVM and (b) the ORIGINAL foreign bytes at that
      // trace's computed offset — writer and reader both checked against
      // the independent encoder, no self-roundtrip anywhere
      val src = new RandomAccessFile(f, "r")
      try {
        var t = 0
        while (t < nTraces) {
          val off = 3600L + t * traceBytes
          raf.seek(off + 188)
          val il = raf.readInt(); val xl = raf.readInt()
          assert(il >= selIl && il < selIl + 10 && xl >= xl0 && xl < xl0 + nXl,
            s"exported trace $t carries out-of-box (il=$il, xl=$xl)")
          val got = new Array[Byte](4 * ns)
          raf.seek(off + 240); raf.readFully(got)
          val bb = java.nio.ByteBuffer.allocate(4 * ns)
          (0 until ns).foreach(j => bb.putFloat(v(il, xl, j)))
          assert(java.util.Arrays.equals(got, bb.array()),
            s"payload mismatch vs closed form at (il=$il, xl=$xl)")
          val srcIdx = (il - il0).toLong * nXl + (xl - xl0)
          val orig = new Array[Byte](4 * ns)
          src.seek(3600L + srcIdx * traceBytes + 240); src.readFully(orig)
          assert(java.util.Arrays.equals(got, orig),
            s"payload differs from the foreign file at (il=$il, xl=$xl)")
          t += 97 // sampled stride across the box
        }
      } finally src.close()
    } finally raf.close()
    org.apache.hadoop.fs.FileUtil
      .fullyDelete(new java.io.File(dir)): Unit
  }
}

/** ~1 GiB tier. Gated behind `SPARK_GRAFT_BIG_FIXTURE=1`; `sbt test`
  * skips it otherwise (the always-on [[SurveyIntegrationSmokeSpec]]
  * keeps the same chain exercised in every suite run).
  */
class BigSurveyIntegrationSpec extends SurveyIntegrationBase {

  private val enabled = sys.env.get("SPARK_GRAFT_BIG_FIXTURE").contains("1")

  // survey geometry (matches gen_big_segy.py defaults scaled by env —
  // SPARK_GRAFT_BIG_NIL/NXL/NS override for quicker local runs)
  private val nIl = sys.env.getOrElse("SPARK_GRAFT_BIG_NIL", "415").toInt
  private val nXl = sys.env.getOrElse("SPARK_GRAFT_BIG_NXL", "415").toInt
  private val ns = sys.env.getOrElse("SPARK_GRAFT_BIG_NS", "1500").toInt

  test("GB-scale foreign survey: read, grid, full-trace probes, store, " +
      "selection, export, byte-compare") {
    assume(enabled, "set SPARK_GRAFT_BIG_FIXTURE=1 to run the GB-scale tier")
    runSurveyIntegration(nIl, nXl, ns)
  }
}

/** The always-on ~77 MB sibling (128×96×1500 samples): the same
  * closed-form foreign survey, the same ingest → grid → probe → store →
  * select → export → byte-compare chain, small enough for every
  * `sbt test` and every driver round — so the strongest end-to-end
  * anchor no longer runs only under its nightly env gate.
  */
class SurveyIntegrationSmokeSpec extends SurveyIntegrationBase {
  test("~77MB foreign survey: read, grid, full-trace probes, store, " +
      "selection, export, byte-compare") {
    runSurveyIntegration(nIl = 128, nXl = 96, ns = 1500)
  }
}
