package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** 1000 foreign-generated IBM32 cross-check vectors
  * (`tools/gen_golden_segy.py` — the independent exact-rational Python
  * encoder, not the engine's own inverse): for each
  * `float32_bits,ibm32_word` pair the engine's decoder must produce the
  * exact float bit pattern and its encoder must reproduce the exact IBM
  * word. Complements the golden-file spec with breadth: random
  * normalized mantissas across the full shared exponent range
  * [16^-25, 16^30], both signs.
  */
class IbmCrosscheckSpec extends AnyFunSuite {

  private val vectors: Seq[(Int, Int)] =
    scala.io.Source.fromFile("src/test/resources/golden/ibm32_crosscheck.csv")
      .getLines().filter(_.nonEmpty).map { line =>
        val Array(f, i) = line.split(",")
        (java.lang.Integer.parseUnsignedInt(f, 16),
          java.lang.Integer.parseUnsignedInt(i, 16))
      }.toSeq

  test("decoder reproduces the exact float32 bit pattern on all 1000 vectors") {
    assert(vectors.size == 1000)
    vectors.zipWithIndex.foreach { case ((fbits, ibm), k) =>
      val got = IbmFloatDecode.decode(ibm)
      assert(java.lang.Float.floatToRawIntBits(got) == fbits,
        f"vector $k: ibm=0x$ibm%08x decoded ${got} (0x${java.lang.Float.floatToRawIntBits(got)}%08x), " +
          f"foreign expects 0x$fbits%08x")
    }
  }

  test("encoder reproduces the exact foreign IBM32 word on all 1000 vectors") {
    vectors.zipWithIndex.foreach { case ((fbits, ibm), k) =>
      val v = java.lang.Float.intBitsToFloat(fbits)
      val got = IbmFloatEncode.encode(v)
      assert(got == ibm,
        f"vector $k: value $v encoded 0x$got%08x, foreign wrote 0x$ibm%08x")
    }
  }
}
