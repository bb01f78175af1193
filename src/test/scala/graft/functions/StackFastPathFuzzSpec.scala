package graft.functions

import java.math.{BigDecimal => JBD, RoundingMode}

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzing for the FAST10/FAST20 fixed-point tier inside the
  * exact-stacking buffers ([[StackBuffer]], [[SqAcc]], [[PosSqAcc]]): the
  * optimized modes must be BIT-identical to the all-BigDecimal reference
  * (the original decimal-mode semantics: per value
  * `BigDecimal.valueOf(x).setScale(10, HALF_UP)`, summed exactly; squares
  * summed at scale 20) under every mode transition, merge order, and
  * serialization roundtrip — because the DuckDB oracle replays exactly
  * those decimal sums.
  */
class StackFastPathFuzzSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], count: Int, seed0: Long): Seq[A] =
    (0 until count).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  /** The reference quantization the decimal mode applies per value. */
  private def refQ(x: Double): JBD =
    JBD.valueOf(x).setScale(10, RoundingMode.HALF_UP)

  // value generators: the fast set (integers, dyadics), its boundary, and
  // values strictly outside it (long decimals, huge magnitudes)
  private val intGen: Gen[Double] = Gen.chooseNum(-100000, 100000).map(_.toDouble)
  // |x| < 2^18 multiples of 2^-10 (the fast set); numerators with trailing
  // zero bits cover the coarser denominators
  private val dyadicGen: Gen[Double] = for {
    num <- Gen.chooseNum(-268435455L, 268435455L)
    shift <- Gen.chooseNum(0, 10)
  } yield (num / (1L << shift) * (1L << shift)).toDouble / 1024.0
  private val slowGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e9, 1e9),                        // arbitrary doubles
    Gen.chooseNum(-1000000, 1000000).map(_ / 7.0),   // non-dyadic rationals
    Gen.chooseNum(262144L, 1L << 41).map(_.toDouble), // above the bound
    Gen.const(262143.9990234375), Gen.const(-262143.9990234375),
    Gen.const(262144.0), Gen.const(0.00000000005), Gen.const(-0.0))
  private val anyGen: Gen[Double] =
    Gen.oneOf(intGen, dyadicGen, slowGen)

  test("q10: whenever it claims a numerator, it matches valueOf+setScale") {
    val vals = samples(anyGen, 4000, 11L) ++
      samples(dyadicGen, 4000, 12L) ++ samples(intGen, 2000, 13L) ++
      Seq(0.0, -0.0, 1.0 / 1024, -1.0 / 1024, 262143.0 + 1023.0 / 1024,
        -262143.0 - 1023.0 / 1024, 0.125, -0.625)
    vals.foreach { x =>
      val q = StackBuffer.q10(x)
      if (q != StackBuffer.Q10Sentinel)
        assert(JBD.valueOf(q, 10).compareTo(refQ(x)) == 0,
          s"q10($x) = $q disagrees with ${refQ(x)}")
      assert(StackBuffer.decQ(x).compareTo(refQ(x)) == 0, s"decQ($x)")
    }
  }

  test("q10 covers the whole provable set (dyadics below 2^18)") {
    samples(Gen.chooseNum(-268435455L, 268435455L), 4000, 21L).foreach { k =>
      val x = k.toDouble / 1024.0
      assert(StackBuffer.q10(x) != StackBuffer.Q10Sentinel, s"missed $x")
    }
  }

  // ---- StackBuffer end-to-end: random traces, random merge tree, ----
  // ---- serialization roundtrips, vs the all-decimal reference     ----

  private def roundtrip(b: StackBuffer): StackBuffer = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    StackBuffer.write(out, b)
    out.flush()
    StackBuffer.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)))
  }

  private val traceModeGen: Gen[Gen[Double]] =
    Gen.oneOf(Gen.const(intGen), Gen.const(dyadicGen),
      Gen.const(slowGen), Gen.const(anyGen))

  test("StackBuffer: fast10 transitions are bit-identical to decimal sums") {
    val len = 7
    val rnd = new scala.util.Random(99)
    (0 until 60).foreach { it =>
      // traces with per-trace value class so buffers promote mid-stream
      val nTraces = 1 + rnd.nextInt(12)
      val traces = (0 until nTraces).map { t =>
        val g = samples(traceModeGen, 1, 1000L * it + t).head
        samples(g, len, 5000L * it + t).toArray
      }
      // reference: plain decimal sums of refQ
      val refSums = Array.fill(len)(JBD.ZERO)
      traces.foreach(tr =>
        (0 until len).foreach(i =>
          refSums(i) = refSums(i).add(refQ(tr(i)))))
      val refMean = (0 until len).map(i =>
        java.lang.Double.parseDouble(refSums(i).toPlainString) /
          nTraces.toDouble)
      // engine: random split into sub-buffers, each built row-wise, then
      // merged in a random order with serialization roundtrips sprinkled
      val q = new Array[Long](len)
      val parts = traces.grouped(1 + rnd.nextInt(4)).map { chunk =>
        val b = new StackBuffer(0L, null, null)
        chunk.foreach(tr => StackBuffer.addWithQ(b, tr, len, q))
        if (rnd.nextBoolean()) roundtrip(b) else b
      }.toSeq
      val acc = new StackBuffer(0L, null, null)
      scala.util.Random.shuffle(parts).foreach(p =>
        StackBuffer.mergeInto(acc, p))
      val got = StackBuffer.meanArray(acc)
      assert(acc.n == nTraces)
      (0 until len).foreach(i =>
        assert(java.lang.Double.doubleToRawLongBits(got(i)) ==
          java.lang.Double.doubleToRawLongBits(refMean(i)),
          s"iter $it pos $i: ${got(i)} vs ${refMean(i)}"))
    }
  }

  // ---- SqAcc: Σx² through every mode chain vs decimal reference ----

  test("SqAcc: long → fast20 → decimal chains match the decimal reference") {
    val rnd = new scala.util.Random(7)
    (0 until 120).foreach { it =>
      val ints = samples(intGen, rnd.nextInt(6), 100L * it)
      val fasts = samples(dyadicGen, rnd.nextInt(6), 200L * it)
      val slows = samples(slowGen, rnd.nextInt(4), 300L * it)
      var ref = JBD.ZERO
      def sq(b: JBD) = b.multiply(b)
      ints.foreach(v => ref = ref.add(sq(new JBD(v.toLong)).setScale(20)))
      fasts.foreach(v => ref = ref.add(sq(refQ(v))))
      slows.foreach(v => ref = ref.add(sq(refQ(v))))
      val acc = SqAcc.empty()
      ints.foreach(v => acc.addLong(v.toLong))
      acc.ensureF20()
      fasts.foreach { v =>
        val q = StackBuffer.q10(v)
        assert(q != StackBuffer.Q10Sentinel)
        acc.addQ(q)
      }
      if (slows.nonEmpty) acc.promote()
      slows.foreach(v => acc.addDec(refQ(v)))
      assert(acc.toBigDecimal.compareTo(ref) == 0,
        s"iter $it: ${acc.toBigDecimal} vs $ref")
      // merge symmetry: acc merged into an empty/els the other way
      val viaMerge = SqAcc.empty()
      viaMerge.mergeFrom(acc)
      assert(viaMerge.toBigDecimal.compareTo(ref) == 0)
    }
  }

  test("SqAcc: the fast20 overflow guard promotes, losing nothing") {
    val q = StackBuffer.q10(262143.0 + 1023.0 / 1024) // maximal numerator
    assert(q != StackBuffer.Q10Sentinel)
    val acc = SqAcc.empty()
    acc.ensureF20()
    val n = 300000
    (0 until n).foreach(_ => acc.addQ(q))
    assert(acc.dec != null, "guard should have promoted at this magnitude")
    val ref = SqAcc.decSq(q).multiply(new JBD(n))
    assert(acc.toBigDecimal.compareTo(ref) == 0)
  }

  test("SqAcc.mergeFrom: every mode pairing is exact") {
    val rnd = new scala.util.Random(31)
    def build(mode: Int, vals: Seq[Double]): (SqAcc, JBD) = {
      val acc = SqAcc.empty()
      var ref = JBD.ZERO
      mode match {
        case 0 => vals.foreach { v =>
          val l = v.toLong
          acc.addLong(l)
          ref = ref.add(new JBD(l).multiply(new JBD(l)).setScale(20))
        }
        case 1 =>
          acc.ensureF20()
          vals.foreach { v =>
            val q = StackBuffer.q10(v)
            if (q != StackBuffer.Q10Sentinel) {
              acc.addQ(q); ref = ref.add(refQ(v).multiply(refQ(v)))
            }
          }
        case _ =>
          acc.promote()
          vals.foreach { v =>
            acc.addDec(refQ(v)); ref = ref.add(refQ(v).multiply(refQ(v)))
          }
      }
      (acc, ref)
    }
    (0 until 80).foreach { it =>
      val (m1, m2) = (rnd.nextInt(3), rnd.nextInt(3))
      val (a, ra) = build(m1, samples(intGen, 4, 10L * it))
      val (b, rb) = build(m2, samples(dyadicGen, 4, 20L * it))
      a.mergeFrom(b)
      assert(a.toBigDecimal.compareTo(ra.add(rb)) == 0,
        s"iter $it modes ($m1,$m2)")
    }
  }

  // ---- PosSqAcc: positional variant, same matrix ----

  private def posRoundtrip(p: PosSqAcc): PosSqAcc = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    PosSqAcc.write(out, p)
    out.flush()
    PosSqAcc.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)))
  }

  test("PosSqAcc: mode chains + merges + roundtrips match the reference") {
    val len = 5
    val rnd = new scala.util.Random(17)
    (0 until 60).foreach { it =>
      val refSq = Array.fill(len)(JBD.ZERO)
      def addRefLong(tr: Array[Double]): Unit =
        (0 until len).foreach { i =>
          val l = new JBD(tr(i).toLong)
          refSq(i) = refSq(i).add(l.multiply(l).setScale(20))
        }
      def addRefQ(tr: Array[Double]): Unit =
        (0 until len).foreach { i =>
          refSq(i) = refSq(i).add(refQ(tr(i)).multiply(refQ(tr(i))))
        }
      def buildPart(): (PosSqAcc, Boolean) = {
        val p = PosSqAcc.empty()
        val nLong = rnd.nextInt(3)
        (0 until nLong).foreach { k =>
          val tr = samples(intGen, len, 900L * it + k).toArray
          p.ensureLong(len)
          (0 until len).foreach(i => p.addLong(i, tr(i).toLong))
          addRefLong(tr)
        }
        val nFast = rnd.nextInt(3)
        if (nFast > 0) p.ensureF20(len)
        (0 until nFast).foreach { k =>
          val tr = samples(dyadicGen, len, 700L * it + k).toArray
          (0 until len).foreach { i =>
            val q = StackBuffer.q10(tr(i))
            assert(q != StackBuffer.Q10Sentinel)
            p.addQ(i, q)
          }
          addRefQ(tr)
        }
        val nSlow = rnd.nextInt(2)
        if (nSlow > 0) { p.promote(); p.ensureDec(len) }
        (0 until nSlow).foreach { k =>
          val tr = samples(slowGen, len, 500L * it + k).toArray
          (0 until len).foreach(i => p.addDec(i, refQ(tr(i))))
          addRefQ(tr)
        }
        (if (rnd.nextBoolean()) posRoundtrip(p) else p, nLong + nFast + nSlow > 0)
      }
      val acc = PosSqAcc.empty()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        val (p, _) = buildPart()
        acc.mergeFrom(p)
      }
      if (acc.length >= 0)
        (0 until len).foreach(i =>
          assert(acc.posDec(i).compareTo(refSq(i)) == 0,
            s"iter $it pos $i: ${acc.posDec(i)} vs ${refSq(i)}"))
    }
  }

  test("StackBuffer: long+long merges past the row cap promote to fast10") {
    // the over-cap pairing used to promote to decimal; it now lands on
    // fast10 (exact either way) — pin exactness at adversarial sums
    val len = 3
    val q = new Array[Long](len)
    val big = StackBuffer.MaxLongAbs.toDouble // 2^40, long-mode ceiling
    val a = new StackBuffer(0L, null, null)
    val b = new StackBuffer(0L, null, null)
    (0 until 5).foreach { _ =>
      StackBuffer.addWithQ(a, Array(big, -big, 7.0), len, q): Unit
      StackBuffer.addWithQ(b, Array(big, big, -3.0), len, q): Unit
    }
    assert(a.longSums != null && b.longSums != null)
    a.n = StackBuffer.MaxLongRows - 2 // force the over-cap pairing
    b.n = 5L
    StackBuffer.mergeInto(a, b)
    assert(a.f10Hi != null, "over-cap long+long should merge as fast10")
    // exact expectations: 5 rows each side
    val sums = Seq(10 * big.toLong, 0L, 5 * 7L - 5 * 3L)
    (0 until len).foreach { i =>
      val got = new JBD(SqAcc.toBigInt(a.f10Hi(i), a.f10Lo(i)), 10)
      assert(got.compareTo(new JBD(sums(i)).setScale(10)) == 0,
        s"pos $i: $got")
    }
  }

  test("SqAcc.ensureF20 at the 2^60 upscale boundary: exact or decimal") {
    // just under the bound: exact ×10^20 inside 128 bits
    val under = SqAcc.empty()
    under.lo = SqAcc.MaxSc0ToF20 // largest upscalable scale-0 total
    under.ensureF20()
    assert(under.dec == null && under.sc20)
    val want = new JBD(SqAcc.MaxSc0ToF20).setScale(20)
    assert(under.toBigDecimal.compareTo(want) == 0)
    // just over: promotes to decimal, value preserved exactly
    val over = SqAcc.empty()
    over.lo = SqAcc.MaxSc0ToF20 + 1
    over.ensureF20()
    assert(over.dec != null)
    assert(over.toBigDecimal.compareTo(
      new JBD(SqAcc.MaxSc0ToF20 + 1).setScale(20)) == 0)
  }

  test("SqAcc: COMPOSED merges past 2^127 promote instead of wrapping") {
    // addQ's guard bounds one buffer below ~2^120, but merges compose —
    // one partial per map partition. 128 guard-limit partials exceed
    // 2^127, where an unguarded 128-bit sum turns Σx² negative.
    val q = StackBuffer.q10(262143.0 + 1023.0 / 1024)
    val perBuf = 190000 // stays below the per-add guard
    val one = SqAcc.empty()
    one.ensureF20()
    (0 until perBuf).foreach(_ => one.addQ(q))
    assert(one.dec == null, "base buffer should still be fixed-point")
    def clone1(): SqAcc = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      SqAcc.write(out, one); out.flush()
      SqAcc.read(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray)))
    }
    val acc = SqAcc.empty()
    acc.ensureF20()
    val copies = 128
    (0 until copies).foreach(_ => acc.mergeFrom(clone1()))
    val ref = SqAcc.decSq(q).multiply(new JBD(perBuf.toLong * copies))
    assert(acc.toBigDecimal.signum() > 0, "merged Σx² wrapped negative")
    assert(acc.toBigDecimal.compareTo(ref) == 0)
  }

  test("PosSqAcc: COMPOSED merges past 2^127 promote instead of wrapping") {
    val len = 2
    val q = StackBuffer.q10(262143.0 + 1023.0 / 1024)
    val perBuf = 190000
    val one = PosSqAcc.empty()
    one.ensureF20(len)
    (0 until perBuf).foreach(_ => (0 until len).foreach(i => one.addQ(i, q)))
    assert(one.dec == null)
    val acc = PosSqAcc.empty()
    val copies = 128
    (0 until copies).foreach(_ => acc.mergeFrom(posRoundtrip(one)))
    val ref = SqAcc.decSq(q).multiply(new JBD(perBuf.toLong * copies))
    (0 until len).foreach { i =>
      assert(acc.posDec(i).signum() > 0, s"pos $i wrapped negative")
      assert(acc.posDec(i).compareTo(ref) == 0)
    }
  }

  test("AGC integral sliding-window fast path is bit-identical to the fold") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def direct(v: Array[Double], window: Int): Array[Double] = {
      val n = v.length; val half = window / 2
      Array.tabulate(n) { i =>
        val lo = math.max(0, i - half); val hi = math.min(n - 1, i + half)
        var acc = 0.0
        var j = lo
        while (j <= hi) { acc += v(j) * v(j); j += 1 }
        val rms = math.sqrt(acc / (hi - lo + 1).toDouble)
        if (rms > 0.0) v(i) / rms else 0.0
      }
    }
    val rnd = new scala.util.Random(5)
    (0 until 60).foreach { it =>
      val n = 1 + rnd.nextInt(400)
      val window = Seq(1, 3, 121, 1023, 8191)(rnd.nextInt(5))
      val v = rnd.nextInt(3) match {
        case 0 => Array.fill(n)( // integral incl. the ±2^20 bound
          (rnd.nextInt(2097153) - 1048576).toDouble)
        case 1 => Array.fill(n)(rnd.nextDouble() * 2000 - 1000)
        case _ => Array.fill(n)(if (rnd.nextBoolean())
          rnd.nextInt(100).toDouble else rnd.nextDouble())
      }
      val expr = AgcExpr(Literal(ArrayData.toArrayData(v),
        ArrayType(DoubleType, containsNull = false)), window)
      val got = expr.kernel(ArrayData.toArrayData(v)).toDoubleArray()
      val want = direct(v, window)
      (0 until n).foreach(i =>
        assert(java.lang.Double.doubleToRawLongBits(got(i)) ==
          java.lang.Double.doubleToRawLongBits(want(i)),
          s"iter $it n=$n window=$window pos $i: ${got(i)} vs ${want(i)}"))
    }
  }

  test("PosSqAcc: guard promotion mid-stream keeps every position exact") {
    val len = 3
    val q = StackBuffer.q10(262143.0 + 1023.0 / 1024)
    val p = PosSqAcc.empty()
    p.ensureF20(len)
    val n = 300000
    (0 until n).foreach(_ => (0 until len).foreach(i => p.addQ(i, q)))
    assert(p.dec != null, "guard should have promoted")
    val ref = SqAcc.decSq(q).multiply(new JBD(n))
    (0 until len).foreach(i => assert(p.posDec(i).compareTo(ref) == 0))
  }
}
