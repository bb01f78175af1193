package graft.`export`

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SegyWriteSpec extends SparkSpec {
  import spark.implicits._

  test("writeSegy emits header + ordered trace records") {
    val df = Seq(
      (2, 20, Array[Byte](9, 9)),
      (1, 10, Array[Byte](1, 2)),
      (3, 30, Array[Byte](7, 7))).toDF("il", "xl", "samples")
      .orderBy("il")
    val records = SegyExport.serializeTraces(df, Seq("il", "xl"), "samples")
    val out = Files.createTempDirectory("segy").toString + "/out.sgy"
    val text = SegyHeaders.sanitizeTextHeader(Seq("C 1 TEST"))
    SegyExport.writeSegy(records, out, text, new Array[Byte](400))

    val bytes = Files.readAllBytes(Paths.get(out))
    // 3200 text + 400 binary + 3 × (4+4+2) records
    assert(bytes.length == 3200 + 400 + 3 * 10)
    // first record after headers is il=1 (global order): big-endian 00 00 00 01
    val first = bytes.slice(3600, 3604).toSeq
    assert(first == Seq[Byte](0, 0, 0, 1))
    val last = bytes.slice(3600 + 20, 3600 + 24).toSeq
    assert(last == Seq[Byte](0, 0, 0, 3))
  }
}
