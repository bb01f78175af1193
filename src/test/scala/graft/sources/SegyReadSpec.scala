package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.`export`.{SegyExport, SegyHeaders}
import graft.functions.IbmFloatDecode
import org.apache.spark.sql.functions._

/** Byte-stream reader tests, mirroring the reference's Teapot import→export
  * round-trip (`tests/integration/test_segy_roundtrip_teapot.py:151-310`):
  * a file written by the engine's own sink reads back bit-identical
  * (headers AND samples), and re-exporting the read frame reproduces the
  * original file byte-for-byte.
  */
class SegyReadSpec extends SparkSpec {
  import spark.implicits._

  private val textLines = SegyHeaders.sanitizeTextHeader(
    Seq("C 1 GRAFT READBACK", "C 2 FIXED CONTENT") ++
      (3 to 40).map(i => f"C$i%3d"))

  private def binaryHeader: Array[Byte] = {
    val b = new Array[Byte](400)
    val rev = SegyHeaders.encodeRevision(1, 0)
    b(300) = ((rev >> 8) & 0xff).toByte
    b(301) = (rev & 0xff).toByte
    b
  }

  // (il, xl, 8-byte payload = two 4-byte BE words)
  private val traces: Seq[(Int, Int, Array[Byte])] = Seq(
    (1, 10, Array[Byte](0, 0, 0, 1, 0, 0, 0, 2)),
    (1, 20, Array[Byte](0, 0, 0, 3, -1, -1, -1, -1)),
    (2, 10, Array[Byte](64, 16, 0, 0, 0, 0, 0, 5)),
    (-3, 7, Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)))

  private def writeFile(): String = {
    val df = traces.toDF("il", "xl", "samples").orderBy("il", "xl")
    val records = SegyExport.serializeTraces(df, Seq("il", "xl"), "samples")
    val out = Files.createTempDirectory("segyread").toString + "/in.sgy"
    SegyExport.writeSegy(records, out, textLines, binaryHeader)
    out
  }

  test("fileInfo reads trace count, text header, and revision from the " +
       "3600 fixed bytes") {
    val f = writeFile()
    val info = SegyRead.fileInfo(spark, f, nHeaderFields = 2, sampleBytes = 8)
    assert(info.nTraces == 4)
    assert(info.fileSize == 3600 + 4 * (8 + 8))
    assert(info.textHeader == textLines)
    assert(info.revision == ((1, 0)))
    assert(info.binaryHeader.toSeq == binaryHeader.toSeq)
  }

  test("fileInfo rejects a file whose length is not header-aligned") {
    val f = writeFile()
    val e = intercept[IllegalArgumentException] {
      SegyRead.fileInfo(spark, f, nHeaderFields = 2, sampleBytes = 7)
    }
    assert(e.getMessage.contains("not a multiple"))
  }

  test("readTraces returns headers and samples bit-equal to what was " +
       "exported, in file order") {
    val f = writeFile()
    val got = SegyRead.readTraces(spark, f, Seq("il", "xl"), sampleBytes = 8)
      .orderBy("trace_index").collect()
    val expected = traces.sortBy { case (il, xl, _) => (il, xl) }
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach {
      case ((row, (il, xl, pay)), i) =>
        assert(row.getAs[Long]("trace_index") == i.toLong)
        assert(row.getAs[Long]("il") == il.toLong) // signed survives
        assert(row.getAs[Long]("xl") == xl.toLong)
        assert(row.getAs[Array[Byte]]("samples").toSeq == pay.toSeq)
    }
  }

  test("split boundaries do not change the result (tracesPerSplit = 1)") {
    val f = writeFile()
    val whole = SegyRead.readTraces(spark, f, Seq("il", "xl"), 8)
      .orderBy("trace_index").collect().map(_.toSeq)
    val split = SegyRead.readTraces(spark, f, Seq("il", "xl"), 8,
      tracesPerSplit = 1)
      .orderBy("trace_index").collect().map(_.toSeq)
    assert(split.length == 4)
    assert(whole.zip(split).forall { case (a, b) =>
      a.zip(b).forall {
        case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
        case (x, y) => x == y
      }
    })
  }

  test("import -> export -> import: re-exported file is byte-identical") {
    val f = writeFile()
    val info = SegyRead.fileInfo(spark, f, 2, 8)
    val readBack = SegyRead.readTraces(spark, f, Seq("il", "xl"), 8)
      .orderBy("trace_index")
    val records = SegyExport.serializeTraces(
      readBack.select(col("il").cast("int").as("il"),
        col("xl").cast("int").as("xl"), col("samples")),
      Seq("il", "xl"), "samples")
    val out = Files.createTempDirectory("segyread").toString + "/out.sgy"
    SegyExport.writeSegy(records, out, info.textHeader, info.binaryHeader)
    assert(Files.readAllBytes(Paths.get(out)).toSeq ==
      Files.readAllBytes(Paths.get(f)).toSeq)
  }

  test("ibmSamples decodes the payload with the native IBM32 kernel") {
    // payload = two IBM32 words synthesized from known bit patterns
    val bits = Seq(0x41100000, 0xC1100000) // +1.0 and -1.0 in IBM hex float
    val pay = java.nio.ByteBuffer.allocate(8)
    bits.foreach(pay.putInt)
    val df = Seq((1, 1, pay.array())).toDF("il", "xl", "samples")
    val records = SegyExport.serializeTraces(df, Seq("il", "xl"), "samples")
    val out = Files.createTempDirectory("segyread").toString + "/ibm.sgy"
    SegyExport.writeSegy(records, out,
      SegyHeaders.sanitizeTextHeader(Seq("C 1")), new Array[Byte](400))
    val decoded = SegyRead.readTraces(spark, out, Seq("il", "xl"), 8)
      .select(SegyRead.ibmSamples(col("samples"), 2).as("v"))
      .collect().head.getSeq[Float](0)
    assert(decoded == bits.map(IbmFloatDecode.decode))
    assert(decoded == Seq(1.0f, -1.0f))
  }

  test("ieeeSamples decodes big-endian IEEE float32 payloads") {
    val floats = Seq(1.5f, -2.25f, 0.0f, Float.MinPositiveValue)
    val pay = java.nio.ByteBuffer.allocate(16)
    floats.foreach(pay.putFloat)
    val df = Seq((1, 1, pay.array())).toDF("il", "xl", "samples")
    val records = SegyExport.serializeTraces(df, Seq("il", "xl"), "samples")
    val out = Files.createTempDirectory("segyread").toString + "/ieee.sgy"
    SegyExport.writeSegy(records, out,
      SegyHeaders.sanitizeTextHeader(Seq("C 1")), new Array[Byte](400))
    val decoded = SegyRead.readTraces(spark, out, Seq("il", "xl"), 16)
      .select(SegyRead.ieeeSamples(col("samples"), 4).as("v"))
      .collect().head.getSeq[Float](0)
    assert(decoded == floats)
  }

  test("standard rev-1 layout: 240-byte headers at spec offsets, " +
       "self-describing geometry, IBM32 samples") {
    // hand-assemble a STANDARD file this engine's sink never wrote:
    // binary header declares ns=3 (bytes 21-22), interval=2000 (17-18),
    // format=1/IBM32 (25-26); two traces with inline/crossline at bytes
    // 189/193, a 2-byte trace_id_code at 29 and a NEGATIVE 2-byte
    // coord_scalar at 71 (sign must survive the short decode)
    val bin = java.nio.ByteBuffer.allocate(400)
    bin.putShort(16, 2000.toShort)  // 0-based 16 = SEG-Y binary bytes 17-18
    bin.putShort(20, 3.toShort)
    bin.putShort(24, 1.toShort)
    bin.putShort(300, SegyHeaders.encodeRevision(1, 0).toShort)
    val ibm = Seq(0x41100000, 0xC1100000, 0x42640000) // +1.0, -1.0, +100.0
    def trace(il: Int, xl: Int, idCode: Short, scalar: Short): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(240 + 12)
      b.putInt(188, il)               // 0-based 188 = header bytes 189-192
      b.putInt(192, xl)
      b.putShort(28, idCode)
      b.putShort(70, scalar)
      b.position(240)
      ibm.foreach(b.putInt)
      b.array()
    }
    val out = Files.createTempDirectory("segystd").toString + "/std.sgy"
    val os = Files.newOutputStream(Paths.get(out))
    try {
      os.write(textLines.mkString.getBytes(
        java.nio.charset.Charset.forName("IBM037")))
      os.write(bin.array())
      os.write(trace(500, 900, 1, -100))
      os.write(trace(501, 901, 3, -100))
    } finally os.close()

    val info = SegyRead.standardInfo(spark, out)
    assert(info.nSamples == 3 && info.sampleInterval == 2000 &&
      info.formatCode == 1)
    assert(info.base.nTraces == 2 && info.base.revision == ((1, 0)))
    assert(info.base.textHeader == textLines)

    import SegyRead.StandardFields._
    val got = SegyRead.readStandardTraces(spark, out,
        Seq(Inline, Crossline, TraceIdCode, CoordScalar))
      .withColumn("v", SegyRead.ibmSamples(col("samples"), info.nSamples))
      .orderBy("trace_index").collect()
    assert(got.map(r => (r.getAs[Long]("inline"), r.getAs[Long]("crossline"),
      r.getAs[Long]("trace_id_code"), r.getAs[Long]("coord_scalar"))).toSeq ==
      Seq((500L, 900L, 1L, -100L), (501L, 901L, 3L, -100L)))
    got.foreach(r =>
      assert(r.getSeq[Float](r.fieldIndex("v")) == Seq(1.0f, -1.0f, 100.0f)))
  }

  test("standard WRITE -> standard READ: spec-offset headers and IBM32 " +
       "samples round-trip bit-exactly") {
    import SegyRead.StandardFields._
    // magnitudes exactly representable in IBM32 (<= 24 significant bits,
    // hex-aligned) so the encode->decode identity is exact
    val sampleSets = Seq(
      Seq(1.0f, -1.0f, 100.0f, 0.0f),
      Seq(0.15625f, -118.625f, 0.5f, 16384.0f))
    val df = sampleSets.zipWithIndex.map { case (v, i) =>
      (200 + i, 300 + i, -100, v)
    }.toDF("inline", "crossline", "coord_scalar", "v")
    val records = SegyExport.serializeStandardTraces(
      df.orderBy("inline")
        .withColumn("samples", SegyExport.ibmPayload(col("v"), 4)),
      Seq(Inline -> "inline", Crossline -> "crossline",
        CoordScalar -> "coord_scalar"),
      "samples")
    val out = Files.createTempDirectory("segystd").toString + "/w.sgy"
    SegyExport.writeSegy(records, out, textLines,
      SegyExport.standardBinaryHeader(nSamples = 4, sampleInterval = 2000,
        formatCode = 1))

    val info = SegyRead.standardInfo(spark, out)
    assert(info.nSamples == 4 && info.formatCode == 1 &&
      info.sampleInterval == 2000 && info.base.nTraces == 2)
    val got = SegyRead.readStandardTraces(spark, out,
        Seq(Inline, Crossline, CoordScalar))
      .withColumn("v", SegyRead.ibmSamples(col("samples"), 4))
      .orderBy("trace_index").collect()
    got.zip(sampleSets).zipWithIndex.foreach { case ((r, vs), i) =>
      assert(r.getAs[Long]("inline") == 200L + i)
      assert(r.getAs[Long]("crossline") == 300L + i)
      assert(r.getAs[Long]("coord_scalar") == -100L)
      assert(r.getSeq[Float](r.fieldIndex("v")) == vs)
    }
  }

  test("IBM32 encode kernel: decode(encode(v)) is exact for hex-aligned " +
       "values and within 2^-20 relative everywhere") {
    import graft.functions.{IbmFloatDecode, IbmFloatEncode}
    Seq(1.0f, -1.0f, 0.0f, 100.0f, 0.15625f, -118.625f, 16384.0f, 0.5f,
      65536.0f, 1.0f / 16, 1.0f / 256).foreach { v =>
      assert(IbmFloatDecode.decode(IbmFloatEncode.encode(v)) == v, s"exact $v")
    }
    assert(IbmFloatEncode.encode(1.0f) == 0x41100000)
    assert(IbmFloatEncode.encode(-1.0f) == 0xC1100000)
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val v = java.lang.Float.intBitsToFloat(rnd.nextInt())
      // every finite nonzero float32 is inside IBM32's range (16^±63
      // spans far past IEEE float32's 2^±126)
      if (!v.isNaN && !v.isInfinite && v != 0.0f) {
        val back = IbmFloatDecode.decode(IbmFloatEncode.encode(v))
        assert(math.abs(back - v) <= math.abs(v) * math.pow(2, -20),
          s"$v -> $back")
      }
    }
  }

  test("per-trace coordinate scalar composes with the standard reader " +
       "(negative divides, zero applies as 1)") {
    import SegyRead.StandardFields._
    def t(cdpX: Int, scalar: Short): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(240 + 4)
      b.putShort(70, scalar); b.putInt(180, cdpX)
      b.array()
    }
    val bin = java.nio.ByteBuffer.allocate(400)
    bin.putShort(20, 1.toShort); bin.putShort(24, 5.toShort)
    val out = Files.createTempDirectory("segysc").toString + "/sc.sgy"
    val os = Files.newOutputStream(Paths.get(out))
    try {
      os.write(new Array[Byte](3200)); os.write(bin.array())
      os.write(t(1234500, -100)); os.write(t(7, 10)); os.write(t(42, 0))
    } finally os.close()
    val got = SegyRead.readStandardTraces(spark, out, Seq(CdpX, CoordScalar))
      .withColumn("x", graft.operators.Coordinates.applyScalarCol(
        col("cdp_x"), col("coord_scalar")))
      .orderBy("trace_index").collect().map(_.getAs[Double]("x"))
    assert(got.toSeq == Seq(12345.0, 70.0, 42.0))
  }

  test("standardInfo rejects unsupported sample format codes") {
    val bin = java.nio.ByteBuffer.allocate(400)
    bin.putShort(20, 3.toShort)
    bin.putShort(24, 4.toShort) // format 4 = fixed-point w/ gain, unsupported
    val out = Files.createTempDirectory("segystd").toString + "/bad.sgy"
    val os = Files.newOutputStream(Paths.get(out))
    try {
      os.write(new Array[Byte](3200)); os.write(bin.array())
    } finally os.close()
    val e = intercept[IllegalArgumentException] {
      SegyRead.standardInfo(spark, out)
    }
    // actionable: names the format AND the supported re-export targets
    assert(e.getMessage.contains("sample format 4"))
    assert(e.getMessage.contains("re-export"))
  }

  test("ASCII text headers auto-detect (a file not written by this engine)") {
    // hand-assemble a file with an ASCII text header
    val ascii = textLines.mkString.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    val rec = java.nio.ByteBuffer.allocate(12)
    rec.putInt(5); rec.putInt(6); rec.putInt(7)
    val out = Files.createTempDirectory("segyread").toString + "/ascii.sgy"
    val os = Files.newOutputStream(Paths.get(out))
    try { os.write(ascii); os.write(new Array[Byte](400)); os.write(rec.array()) }
    finally os.close()
    val info = SegyRead.fileInfo(spark, out, 2, 4)
    assert(info.textHeader == textLines)
    assert(info.nTraces == 1)
    val row = SegyRead.readTraces(spark, out, Seq("il", "xl"), 4).collect().head
    assert(row.getAs[Long]("il") == 5L && row.getAs[Long]("xl") == 6L)
    assert(row.getAs[Array[Byte]]("samples").toSeq ==
      Seq[Byte](0, 0, 0, 7))
  }

  test("integer sample formats 2/3/8 round-trip through intPayload -> " +
       "intSamples, negatives and width extremes included") {
    import SegyRead.StandardFields._
    // per format: values at the signed extremes of its width
    val cases = Seq(
      (2, Seq(Int.MaxValue, Int.MinValue, -1, 12345678)),
      (3, Seq(32767, -32768, -1, 1234)),
      (8, Seq(127, -128, -1, 42)))
    cases.foreach { case (fmt, vals) =>
      val df = Seq((7, 9, vals)).toDF("inline", "crossline", "v")
      val records = SegyExport.serializeStandardTraces(
        df.withColumn("samples", SegyExport.intPayload(col("v"), 4, fmt)),
        Seq(Inline -> "inline", Crossline -> "crossline"), "samples")
      val out = Files.createTempDirectory("segyint").toString + s"/f$fmt.sgy"
      SegyExport.writeSegy(records, out, textLines,
        SegyExport.standardBinaryHeader(nSamples = 4, sampleInterval = 1000,
          formatCode = fmt))
      val info = SegyRead.standardInfo(spark, out)
      assert(info.formatCode == fmt && info.nSamples == 4)
      val got = SegyRead.readStandardTraces(spark, out, Seq(Inline, Crossline))
        .withColumn("v", SegyRead.decodeSamples(col("samples"), 4, fmt))
        .collect().head
      assert(got.getAs[Long]("inline") == 7L)
      assert(got.getSeq[Int](got.fieldIndex("v")) == vals, s"format $fmt")
    }
  }

  test("count-like trace-header fields decode unsigned: n_samples above " +
       "32767 does not read negative") {
    import SegyRead.StandardFields._
    // 40000 fits the unsigned 2-byte range; the write-side overflow check
    // accepts it and the read side must not sign-wrap it to -25536
    val df = Seq((1, 2, 40000, 50000)).toDF("inline", "crossline", "ns", "si")
    val records = SegyExport.serializeStandardTraces(
      df.withColumn("samples", lit(Array[Byte](0, 0, 0, 0))),
      Seq(Inline -> "inline", Crossline -> "crossline",
        NSamples -> "ns", SampleInterval -> "si"), "samples")
    val out = Files.createTempDirectory("segyuns").toString + "/u.sgy"
    SegyExport.writeSegy(records, out, textLines,
      SegyExport.standardBinaryHeader(nSamples = 1, sampleInterval = 1000,
        formatCode = 2))
    val got = SegyRead.readStandardTraces(spark, out,
      Seq(Inline, NSamples, SampleInterval)).collect().head
    assert(got.getAs[Long]("n_samples") == 40000L)
    assert(got.getAs[Long]("sample_interval") == 50000L)
  }

  test("header-field overflow fails loudly instead of wrapping under the " +
       "width mask") {
    import SegyRead.StandardFields._
    val df = Seq((1, 70000)).toDF("inline", "scl")
    val e = intercept[Exception] {
      SegyExport.serializeStandardTraces(
        df.withColumn("samples", lit(Array[Byte](0))),
        Seq(Inline -> "inline", CoordScalar -> "scl"), "samples")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("coord_scalar value 70000 overflows")))
  }

  test("early-terminated scans (limit) close the split's file handle via " +
       "the task-completion listener") {
    val f = writeFile()
    def openHandles: Int = {
      val fdDir = new java.io.File("/proc/self/fd")
      if (!fdDir.exists()) -1
      else fdDir.listFiles().count { l =>
        try java.nio.file.Files.readSymbolicLink(l.toPath).toString == f
        catch { case _: Exception => false }
      }
    }
    assume(openHandles >= 0, "/proc/self/fd not available")
    // limit(1) stops consuming after one row: the iterator never drains,
    // so only the listener can release the handle
    val one = SegyRead.readTraces(spark, f, Seq("il", "xl"), 8,
      tracesPerSplit = 1).limit(1).collect()
    assert(one.length == 1)
    assert(openHandles == 0, "open handle leaked past task completion")
    val std = writeStdFile()
    val oneStd = SegyRead.readStandardTraces(spark, std,
      Seq(SegyRead.StandardFields.Inline), tracesPerSplit = 1)
      .limit(1).collect()
    assert(oneStd.length == 1)
  }

  private def writeStdFile(): String = {
    import SegyRead.StandardFields._
    val df = Seq((1, 2), (3, 4)).toDF("inline", "crossline")
    val records = SegyExport.serializeStandardTraces(
      df.withColumn("samples", lit(Array[Byte](0, 0))),
      Seq(Inline -> "inline", Crossline -> "crossline"), "samples")
    val out = Files.createTempDirectory("segylim").toString + "/s.sgy"
    SegyExport.writeSegy(records, out, textLines,
      SegyExport.standardBinaryHeader(nSamples = 1, sampleInterval = 1000,
        formatCode = 3))
    out
  }
}
