package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinSliceSpec extends SparkSpec {
  import spark.implicits._

  test("BeIntAt.decode assembles signed/unsigned big-endian words") {
    val b = Array[Byte](0x80.toByte, 0x01, 0xff.toByte, 0xfe.toByte)
    assert(BeIntAt.decode(b, 0, 4, signed = true) == 0x8001fffe)
    assert(BeIntAt.decode(b, 0, 2, signed = true) == -32767)
    assert(BeIntAt.decode(b, 0, 2, signed = false) == 0x8001)
    assert(BeIntAt.decode(b, 2, 2, signed = true) == -2)
    assert(BeIntAt.decode(b, 2, 2, signed = false) == 0xfffe)
    assert(BeIntAt.decode(b, 0, 1, signed = true) == -128)
    assert(BeIntAt.decode(b, 0, 1, signed = false) == 128)
    assert(BeIntAt.decode(b, 1, 1, signed = true) == 1)
  }

  test("BeIntAt expression matches the scalar decode under codegen") {
    val bytes = Array[Byte](0x12, 0x34, 0x80.toByte, 0xff.toByte, 0x00, 0x7f)
    val df = Seq(Tuple1(bytes)).toDF("b")
    val got = df.select(
      BeIntAt(col("b"), lit(0), 4).as("w4"),
      BeIntAt(col("b"), lit(2), 2).as("w2s"),
      BeIntAt(col("b"), lit(2), 2, signed = false).as("w2u"),
      BeIntAt(col("b"), lit(3), 1).as("w1s"),
      BeIntAt(col("b"), lit(3), 1, signed = false).as("w1u")).collect().head
    assert(got.getInt(0) == 0x123480ff)
    assert(got.getInt(1) == BeIntAt.decode(bytes, 2, 2, signed = true))
    assert(got.getInt(2) == 0x80ff)
    assert(got.getInt(3) == -1)
    assert(got.getInt(4) == 255)
  }

  test("BeIntAt rejects widths outside {1, 2, 4}") {
    val e = intercept[IllegalArgumentException] {
      BeIntAt(lit(Array[Byte](0, 0, 0)), lit(0), 3)
    }
    assert(e.getMessage.contains("width"))
  }

  test("DoubleBits -> big-endian pack -> BeDoubleAt round-trips raw bits, " +
       "NaN payload and negative zero included") {
    val vals = Seq(0.0, -0.0, 1.5, -12345.6789, Double.MinPositiveValue,
      Double.MaxValue, Double.NegativeInfinity,
      java.lang.Double.longBitsToDouble(0x7ff8000000c0ffeeL)) // NaN payload
    val packed = vals.map { d =>
      val bits = java.lang.Double.doubleToRawLongBits(d)
      (0 until 8).map(i => ((bits >>> (8 * (7 - i))) & 0xff).toByte).toArray
    }
    packed.zip(vals).foreach { case (bytes, d) =>
      assert(java.lang.Double.doubleToRawLongBits(BeDoubleAt.decode(bytes, 0)) ==
        java.lang.Double.doubleToRawLongBits(d))
    }
    // the column pair under codegen: encode via DoubleBits + hex pack,
    // decode via BeDoubleAt — identity on raw bits
    val df = vals.map(d => Tuple1(d)).toDF("d")
    val enc = df.select(col("d"),
      call_function("to_binary",
        lpad(hex(DoubleBits(col("d"))), 16, "0"), lit("hex")).as("b"))
    val got = enc.select(col("d"), BeDoubleAt(col("b"), lit(0)).as("rt")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("format 4 fails with an actionable message; format 6 is 8 bytes") {
    assert(graft.sources.SegyRead.bytesPerSample(6) == 8)
    val e = intercept[IllegalArgumentException] {
      graft.sources.SegyRead.bytesPerSample(4)
    }
    assert(e.getMessage.contains("format 4"))
    assert(e.getMessage.contains("re-export"))
  }

  test("BeBytesPack checked bounds: width-8 unsigned admits every long " +
      "(2^64-1 rides as -1L); narrower widths still reject overflow") {
    // every 64-bit pattern is a valid unsigned value at width 8 - the
    // old signed compare against the -1L sentinel rejected ALL values
    for (v <- Seq(0L, 1L, Long.MaxValue, -1L, Long.MinValue)) {
      val b = BeBytesPack.encode(v, 8, unsigned = true, checked = true, "f")
      var got = 0L
      b.foreach(x => got = (got << 8) | (x & 0xffL))
      assert(got == v)
    }
    // signed width-8 checked also passes every long (the full range)
    assert(BeBytesPack.encode(-1L, 8, unsigned = false, checked = true, "f")
      .forall(_ == -1.toByte))
    // narrower widths keep failing loudly
    intercept[IllegalArgumentException] {
      BeBytesPack.encode(1L << 16, 2, unsigned = true, checked = true, "f")
    }
    intercept[IllegalArgumentException] {
      BeBytesPack.encode(-1L, 4, unsigned = true, checked = true, "f")
    }
    intercept[IllegalArgumentException] {
      BeBytesPack.encode(70000L, 2, unsigned = false, checked = true, "f")
    }
  }
}
