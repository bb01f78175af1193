package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Named binary-header decode checked against REAL survey bytes: the
  * 400-byte Teapot Dome binary header (public-domain survey; raw bytes
  * and the expected field dict are pinned by the reference's own
  * integration anchor, `tests/integration/test_segy_roundtrip_teapot.py:
  * 100-149`). The catalog decode must reproduce every named value from
  * genuine field-data bytes no code in this repo produced.
  */
class BinaryHeaderSpec extends AnyFunSuite {

  private val raw: Array[Byte] = java.util.Base64.getDecoder.decode(
    scala.io.Source.fromFile(
      "src/test/resources/golden/teapot_binary_header.b64").mkString.trim)

  // the reference's expected dict, verbatim field names
  private val expected = Seq(
    "job_id" -> 9999, "line_num" -> 9999, "reel_num" -> 1,
    "data_traces_per_ensemble" -> 188, "aux_traces_per_ensemble" -> 0,
    "sample_interval" -> 2000, "orig_sample_interval" -> 0,
    "samples_per_trace" -> 1501, "orig_samples_per_trace" -> 1501,
    "data_sample_format" -> 1, "ensemble_fold" -> 57,
    "trace_sorting_code" -> 4, "vertical_sum_code" -> 1,
    "sweep_freq_start" -> 0, "sweep_freq_end" -> 0, "sweep_length" -> 0,
    "sweep_type_code" -> 0, "sweep_trace_num" -> 0,
    "sweep_taper_start" -> 0, "sweep_taper_end" -> 0, "taper_type_code" -> 0,
    "correlated_data_code" -> 2, "binary_gain_code" -> 1,
    "amp_recovery_code" -> 4, "measurement_system_code" -> 2,
    "impulse_polarity_code" -> 1, "vibratory_polarity_code" -> 0,
    "segy_revision_major" -> 0, "segy_revision_minor" -> 0,
    "fixed_length_trace_flag" -> 0, "num_extended_text_headers" -> 0)

  test("Teapot Dome binary header decodes to the reference's golden dict") {
    assert(raw.length == 400)
    val got = SegyRead.decodeBinaryHeader(raw)
    assert(got.size == expected.size)
    expected.foreach { case (name, v) =>
      assert(got.toMap.get(name).contains(v),
        s"$name: got ${got.toMap.get(name)}, expected $v")
    }
    // order follows the byte layout
    assert(got.map(_._1) == expected.map(_._1))
  }

  test("the engine's own foreign fixture decodes through the same catalog") {
    val head = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/golden/foreign_rev1_ibm.sgy"))
    val bin = java.util.Arrays.copyOfRange(head, 3200, 3600)
    val m = SegyRead.decodeBinaryHeader(bin).toMap
    assert(m("job_id") == 7001 && m("line_num") == 7)
    assert(m("sample_interval") == 4000 && m("samples_per_trace") == 8)
    assert(m("data_sample_format") == 1)
    assert(m("segy_revision_major") == 1 && m("segy_revision_minor") == 0)
    assert(m("num_extended_text_headers") == 0)
  }

  test("bad header length fails loudly") {
    val e = intercept[IllegalArgumentException] {
      SegyRead.decodeBinaryHeader(new Array[Byte](399))
    }
    assert(e.getMessage.contains("400"))
  }
}
