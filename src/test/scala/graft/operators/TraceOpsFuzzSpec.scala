package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential fuzzing for [[TraceOps]]: random traces (negatives, zeros,
  * dead runs, sub-sample magnitudes) through the column expressions vs a
  * direct scala reference computing THE SAME IEEE operation order — the
  * expressions must be bit-identical, not approximately equal, because the
  * DuckDB oracle replays them bit-for-bit.
  */
class TraceOpsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], count: Int, seed0: Long): Seq[A] =
    (0 until count).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  private val valGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1000, 1000).map(_.toDouble),
    Gen.const(0.0),
    Gen.chooseNum(-16, 16).map(_ / 8.0)) // dyadic sub-sample values

  private val traceGen: Gen[(List[Double], Int)] = for {
    n <- Gen.chooseNum(1, 9)
    v <- Gen.listOfN(n, valGen)
    w <- Gen.oneOf(1, 3, 5)
  } yield (v, w)

  private def agcRef(v: Seq[Double], w: Int): Seq[Double] = {
    val n = v.length
    val half = w / 2
    (1 to n).map { i =>
      val lo = math.max(1, i - half)
      val hi = math.min(n, i + half)
      var acc = 0.0
      (lo to hi).foreach(j => acc = acc + v(j - 1) * v(j - 1))
      val rms = math.sqrt(acc / (hi - lo + 1).toDouble)
      if (rms > 0.0) v(i - 1) / rms else 0.0
    }
  }

  private def shiftRef(v: Seq[Double], sh: Double): Seq[Double] = {
    val n = v.length
    def at(j: Int): Double = if (j >= 1 && j <= n) v(j - 1) else 0.0
    (1 to n).map { i =>
      val pos = i.toDouble + sh
      val i0 = math.floor(pos).toInt
      val f = pos - i0.toDouble
      val v0 = at(i0)
      val v1 = at(i0 + 1)
      v0 + (v1 - v0) * f
    }
  }

  test("AGC expression is bit-identical to the scala reference on 150 traces") {
    samples(traceGen, 150, seed0 = 0xA6C).zipWithIndex.foreach {
      case ((v, w), i) =>
        val got = Seq(Tuple1(v)).toDF("v")
          .select(TraceOps.agc(col("v"), v.length, w).as("o"))
          .as[Seq[Double]].head()
        assert(got == agcRef(v, w), s"case $i: v=$v w=$w")
    }
  }

  test("shiftResample is bit-identical to the scala reference on 150 traces") {
    val gen = for {
      (v, _) <- traceGen
      k <- Gen.chooseNum(-20, 20) // shifts in [-2.5, 2.5] sample eighths
    } yield (v, k / 8.0)
    samples(gen, 150, seed0 = 0x5417).zipWithIndex.foreach {
      case ((v, sh), i) =>
        val got = Seq(Tuple1(v)).toDF("v")
          .select(TraceOps.shiftResample(col("v"), v.length, lit(sh)).as("o"))
          .as[Seq[Double]].head()
        assert(got == shiftRef(v, sh), s"case $i: v=$v sh=$sh")
    }
  }

  test("stack equals the exact rational mean on grouped random traces") {
    val corpGen = for {
      nCells <- Gen.chooseNum(1, 4)
      n <- Gen.chooseNum(1, 4)
      rows <- Gen.listOfN(12, for {
        c <- Gen.chooseNum(1, nCells)
        v <- Gen.listOfN(n, Gen.chooseNum(-10000, 10000).map(_ / 4.0))
      } yield (c, v))
    } yield (rows, n)
    samples(corpGen, 40, seed0 = 0x57AC).zipWithIndex.foreach {
      case ((rows, n), i) =>
        val got = TraceOps.stack(rows.toDF("cell", "v"), Seq("cell"), "v", n)
          .select("cell", "n_traces", "stack")
          .as[(Int, Long, Seq[Double])].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        rows.groupBy(_._1).foreach { case (c, rs) =>
          val (cnt, st) = got(c)
          assert(cnt == rs.size, s"case $i cell $c count")
          (0 until n).foreach { j =>
            // quarters sum exactly in BigDecimal; mean = exact-sum double / n
            val exact = rs.map(r => BigDecimal(r._2(j))).sum
            assert(st(j) == (exact.toDouble / cnt), s"case $i cell $c pos $j")
          }
        }
    }
  }

  test("AGC + shift + stack stay bit-identical at REAL trace lengths " +
      "(800-1600 samples, windows 61/121)") {
    // the verdict-flagged regime: per-sample expression trees choked here;
    // the kernels must match the scala reference bit-for-bit regardless
    val gen = for {
      n <- Gen.chooseNum(800, 1600)
      w <- Gen.oneOf(61, 121)
      v <- Gen.listOfN(n, valGen)
      sh <- Gen.chooseNum(-20, 20).map(_ / 8.0)
    } yield (v, w, sh)
    samples(gen, 12, seed0 = 0x10D6).zipWithIndex.foreach { case ((v, w, sh), i) =>
      val df = Seq(Tuple1(v)).toDF("v")
      val gotAgc = df.select(TraceOps.agc(col("v"), v.length, w).as("o"))
        .as[Seq[Double]].head()
      assert(gotAgc == agcRef(v, w), s"long case $i agc (n=${v.length}, w=$w)")
      val gotShift = df.select(
          TraceOps.shiftResample(col("v"), v.length, lit(sh)).as("o"))
        .as[Seq[Double]].head()
      assert(gotShift == shiftRef(v, sh), s"long case $i shift")
    }
    // long-trace stack: 30 traces x 1200 samples in 3 cells, exact means
    val n = 1200
    val rows = (0 until 30).map { r =>
      (r % 3, (0 until n).map(j => ((r * 31 + j * 7) % 2000 - 1000).toDouble))
    }
    val got = TraceOps.stack(rows.toDF("cell", "v"), Seq("cell"), "v", n)
      .select("cell", "n_traces", "stack")
      .as[(Int, Long, Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    rows.groupBy(_._1).foreach { case (c, rs) =>
      val (cnt, st) = got(c)
      assert(cnt == rs.size)
      (0 until n).foreach { j =>
        val exact = rs.map(r => BigDecimal(r._2(j))).sum
        assert(st(j) == (exact.toDouble / cnt), s"cell $c pos $j")
      }
    }
  }

  test("FIR filter is bit-identical to the scala reference on 120 traces " +
      "(random taps/centers, short + long)") {
    def firRef(v: Seq[Double], c: Seq[Double], center: Int): Seq[Double] =
      v.indices.map { i =>
        var acc = 0.0
        c.indices.foreach { k =>
          val j = i + k - center
          acc += c(k) * (if (j >= 0 && j < v.length) v(j) else 0.0)
        }
        acc
      }
    val gen = for {
      nv <- Gen.oneOf(Gen.chooseNum(1, 9), Gen.chooseNum(900, 1100))
      v <- Gen.listOfN(nv, valGen)
      nt <- Gen.chooseNum(1, 7)
      c <- Gen.listOfN(nt, Gen.chooseNum(-16, 16).map(_ / 4.0))
      ctr <- Gen.chooseNum(0, nt - 1)
    } yield (v, c, ctr)
    samples(gen, 120, seed0 = 0xF17).zipWithIndex.foreach { case ((v, c, ctr), i) =>
      val got = Seq(Tuple1(v)).toDF("v")
        .select(TraceOps.firFilter(col("v"), v.length, c, ctr).as("o"))
        .as[Seq[Double]].head()
      assert(got == firRef(v, c, ctr), s"case $i: n=${v.length} taps=$c ctr=$ctr")
    }
  }

  test("fused moveoutScan is bit-identical to the explode→shift→stack→" +
      "window composition (nulls, ties, decimal-mode values)") {
    val gen = for {
      nCells <- Gen.chooseNum(1, 3)
      n <- Gen.oneOf(2, 5, 48)
      rows <- Gen.listOfN(14, for {
        c <- Gen.chooseNum(1, nCells)
        off <- Gen.option(Gen.chooseNum(0, 3).map(_.toDouble))
        // 1/3-style values exceed decimal scale 10 → both paths must take
        // the SAME HALF_UP quantization through the shared StackBuffer
        v <- Gen.option(Gen.listOfN(n, Gen.oneOf(
          Gen.chooseNum(-400, 400).map(_ / 4.0),
          Gen.chooseNum(-9, 9).map(_ / 3.0),
          Gen.const(0.0))))
      } yield (c, off, v))
    } yield (rows, n)
    val cands = Seq(0.0, 0.125, 0.25, 0.5)
    samples(gen, 25, seed0 = 0xF05D).zipWithIndex.foreach {
      case ((rows, n), i) =>
        val df = rows.toDF("cell", "off", "v")
        def canon(r: org.apache.spark.sql.DataFrame) =
          r.select("cell", "best_shift", "n_traces", "energy", "stack")
            .as[(Int, Double, Long, Double, Seq[Double])].collect().sortBy(_._1)
        val fused = canon(TraceOps.moveoutScan(df, Seq("cell"), "v", n,
          "off", cands, emitStack = true))
        val composed = canon(TraceOps.moveoutScanComposed(df, Seq("cell"),
          "v", n, "off", cands, emitStack = true))
        assert(fused.toSeq == composed.toSeq, s"case $i")
    }
  }

  test("moveoutScan picks the brute-force argmax on 30 random gathers") {
    val gen = for {
      nCells <- Gen.chooseNum(1, 3)
      n <- Gen.oneOf(2, 3, 4, 48) // include a longer-trace gather: the
                                  // kernelized shift→stack→dot chain
                                  // must argmax identically at length 48
      rows <- Gen.listOfN(10, for {
        c <- Gen.chooseNum(1, nCells)
        off <- Gen.chooseNum(0, 3)
        v <- Gen.listOfN(n, Gen.chooseNum(-400, 400).map(_ / 4.0))
      } yield (c, off.toDouble, v))
    } yield (rows, n)
    val cands = Seq(0.0, 0.25, 0.5)
    samples(gen, 30, seed0 = 0x3007).zipWithIndex.foreach {
      case ((rows, n), i) =>
        val got = TraceOps.moveoutScan(rows.toDF("cell", "off", "v"),
            Seq("cell"), "v", n, "off", cands)
          .select("cell", "best_shift")
          .as[(Int, Double)].collect().toMap
        // brute: shift (same lerp order), exact mean, fixed-order energy
        rows.groupBy(_._1).foreach { case (c, rs) =>
          val best = cands.map { s =>
            val shifted = rs.map(r => shiftRef(r._3, s * r._2))
            val means = (0 until n).map { j =>
              shifted.map(t => BigDecimal(t(j))).sum.toDouble / rs.size
            }
            s -> means.map(m => m * m).reduce(_ + _)
          }.sortBy { case (s, e) => (-e, s) }.head._1
          assert(got(c) == best, s"case $i cell $c")
        }
    }
  }

  test("semblance moveout is bit-identical to an exact serial reference " +
      "(long + decimal modes, nulls, zero gathers, NaN on empty)") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val gen = for {
      nCells <- Gen.chooseNum(1, 3)
      n <- Gen.oneOf(2, 5, 48)
      rows <- Gen.listOfN(16, for {
        c <- Gen.chooseNum(1, nCells)
        off <- Gen.option(Gen.chooseNum(0, 3).map(_.toDouble))
        v <- Gen.option(Gen.oneOf(
          // integer values: long-mode buffers (cand 0 / integer shifts)
          Gen.listOfN(n, Gen.chooseNum(-500, 500).map(_.toDouble)),
          // thirds: force scale-10 HALF_UP quantization (decimal mode)
          Gen.listOfN(n, Gen.chooseNum(-9, 9).map(_ / 3.0)),
          Gen.listOfN(n, Gen.const(0.0))))
      } yield (c, off, v))
    } yield (rows, n)
    val cands = Seq(0.0, 0.125, 0.25, 0.5)
    samples(gen, 25, seed0 = 0x5E3B).zipWithIndex.foreach {
      case ((rows, n), i) =>
        val got = TraceOps.moveoutScan(rows.toDF("cell", "off", "v"),
            Seq("cell"), "v", n, "off", cands, emitStack = true,
            coherence = "semblance")
          .select("cell", "best_shift", "n_traces", "semblance", "stack")
          .as[(Int, Double, Long, Double, Seq[Double])].collect()
          .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
        // serial reference: the SAME scale-10 quantized lerped values,
        // exact decimal folds, double steps only at the very end — the
        // order-independent contract the kernel's mode machinery keeps
        rows.groupBy(_._1).foreach { case (cell, rs) =>
          val live = rs.collect { case (_, Some(off), Some(v)) => (off, v) }
          var bestIdx = -1; var bestS = 0.0
          var bestStack: Seq[Double] = null; var bestN = 0L
          cands.zipWithIndex.foreach { case (cand, ci) =>
            val sums = Array.fill(n)(JBD.ZERO)
            var den = JBD.ZERO
            live.foreach { case (off, v) =>
              val shifted = shiftRef(v, cand * off)
              shifted.zipWithIndex.foreach { case (rv, j) =>
                val q = JBD.valueOf(rv).setScale(10, RoundingMode.HALF_UP)
                sums(j) = sums(j).add(q)
                den = den.add(q.multiply(q))
              }
            }
            val nT = live.size.toLong
            var num = JBD.ZERO
            sums.foreach(s => num = num.add(s.multiply(s)))
            val s = java.lang.Double.parseDouble(num.toPlainString) /
              (nT.toDouble * java.lang.Double.parseDouble(den.toPlainString))
            val stack =
              if (nT == 0) Seq.empty[Double]
              else sums.map(x => java.lang.Double.parseDouble(x.toPlainString)
                / nT.toDouble).toSeq
            if (bestIdx < 0 || s > bestS) {
              bestIdx = ci; bestS = s; bestStack = stack; bestN = nT
            }
          }
          val (gShift, gN, gS, gStack) = got(cell)
          assert(gShift == cands(bestIdx) && gN == bestN &&
            java.lang.Double.compare(gS, bestS) == 0 && // NaN-safe, bit-strict
            gStack == bestStack,
            s"case $i cell $cell: got ${got(cell)}, " +
              s"want ${(cands(bestIdx), bestN, bestS, bestStack)}")
        }
    }
  }

  test("semblance panel is bit-identical to an exact serial reference " +
      "(windowed prefix sums, long + decimal modes, clipped edges)") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val gen = for {
      nCells <- Gen.chooseNum(1, 3)
      n <- Gen.oneOf(2, 5, 48)
      w <- Gen.oneOf(1, 3, 7)
      rows <- Gen.listOfN(14, for {
        c <- Gen.chooseNum(1, nCells)
        off <- Gen.option(Gen.chooseNum(0, 3).map(_.toDouble))
        v <- Gen.option(Gen.oneOf(
          Gen.listOfN(n, Gen.chooseNum(-500, 500).map(_.toDouble)),
          Gen.listOfN(n, Gen.chooseNum(-9, 9).map(_ / 3.0)),
          Gen.listOfN(n, Gen.const(0.0))))
      } yield (c, off, v))
    } yield (rows, n, w)
    val cands = Seq(0.0, 0.125, 0.5)
    samples(gen, 20, seed0 = 0x9A7E1).zipWithIndex.foreach {
      case ((rows, n, w), i) =>
        val got = TraceOps.semblancePanel(rows.toDF("cell", "off", "v"),
            Seq("cell"), "v", n, "off", cands, window = w)
          .select("cell", "shift", "n_traces", "panel")
          .as[(Int, Double, Long, Seq[Double])].collect()
          .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
        val h = (w - 1) / 2
        rows.groupBy(_._1).foreach { case (cell, rs) =>
          val live = rs.collect { case (_, Some(off), Some(v)) => (off, v) }
          cands.foreach { cand =>
            val sums = Array.fill(n)(JBD.ZERO)
            val dens = Array.fill(n)(JBD.ZERO)
            live.foreach { case (off, v) =>
              shiftRef(v, cand * off).zipWithIndex.foreach { case (rv, j) =>
                val q = JBD.valueOf(rv).setScale(10, RoundingMode.HALF_UP)
                sums(j) = sums(j).add(q)
                dens(j) = dens(j).add(q.multiply(q))
              }
            }
            val nT = live.size.toLong
            val want = (0 until n).map { t =>
              val lo = math.max(0, t - h); val hi = math.min(n, t + h + 1)
              var num = JBD.ZERO; var den = JBD.ZERO
              (lo until hi).foreach { tau =>
                num = num.add(sums(tau).multiply(sums(tau)))
                den = den.add(dens(tau))
              }
              java.lang.Double.parseDouble(num.toPlainString) /
                (nT.toDouble * java.lang.Double.parseDouble(den.toPlainString))
            }
            val (gN, gPanel) = got((cell, cand))
            val wPanel = if (nT == 0) Seq.empty[Double] else want
            assert(gN == nT && gPanel.length == wPanel.length &&
              gPanel.zip(wPanel).forall { case (a, b) =>
                java.lang.Double.compare(a, b) == 0 },
              s"case $i cell $cell cand $cand: got $gPanel want $wPanel")
          }
        }
    }
  }

  test("SqAcc 128-bit accumulation matches BigInteger at the 2^40 extremes " +
      "(carries, merges at random splits, mid-stream promotion)") {
    import java.math.{BigDecimal => JBD}
    import graft.functions.SqAcc
    val big = graft.functions.StackBuffer.MaxLongAbs // 2^40
    val valsGen = Gen.listOfN(200, Gen.oneOf(
      Gen.const(big), Gen.const(-big), Gen.const(big - 1),
      Gen.chooseNum(-1000000L, 1000000L)))
    samples(valsGen, 20, seed0 = 0xACC).zipWithIndex.foreach {
      case (vs, i) =>
        val expect = vs.map { v =>
          val b = java.math.BigInteger.valueOf(v); b.multiply(b)
        }.reduce(_.add(_))
        // single accumulator
        val one = SqAcc.empty()
        vs.foreach(one.addLong)
        assert(one.toBigDecimal.toBigInteger == expect, s"case $i single")
        // random split, merged long+long
        val cut = (i * 37) % vs.length
        val (l, r) = vs.splitAt(cut)
        val a = SqAcc.empty(); l.foreach(a.addLong)
        val b = SqAcc.empty(); r.foreach(b.addLong)
        a.mergeFrom(b)
        assert(a.toBigDecimal.toBigInteger == expect, s"case $i merged")
        // promote mid-stream: decimal tail must agree with the long total
        val p = SqAcc.empty(); l.foreach(p.addLong)
        p.promote()
        r.foreach(v => p.addDec(new JBD(v).setScale(10)))
        assert(p.toBigDecimal.compareTo(new JBD(expect).setScale(20)) == 0,
          s"case $i promoted")
    }
  }
}
