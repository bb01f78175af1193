package graft.functions

import graft.SparkSpec
import graft.operators.AccessPatterns
import org.apache.spark.sql.functions._

/** [[QuantPackExprs]]: the transform-coded lossy storage path must be
  * BIT-IDENTICAL to the documented `quantize(x).cast(float)` column — the
  * codec is a layout change, never a second approximation.
  */
class QuantPackSpec extends SparkSpec {
  import spark.implicits._

  private val tol = 0.25 // step 0.5: exercises the HALF_UP .5 boundaries

  test("pack→unpack replays quantize(x).cast(float) bit-for-bit, " +
      "including negative values, zeros, and exact half-step boundaries") {
    // values sitting ON k·step and ON the .25 rounding boundary, both
    // signs — HALF_UP and half-even disagree exactly here
    val traces = Seq(
      Seq(0.0f, 0.25f, -0.25f, 0.75f, -0.75f, 1.0f, -1.0f),
      Seq(123.456f, -987.654f, 0.124f, 0.126f, -0.124f, -0.126f, 3.5f),
      (1 to 500).map(i => (math.sin(i / 9.0) * 800 +
        ((i * 2654435761L) % 1000) - 500).toFloat))
    val df = traces.zipWithIndex.map(_.swap).toDF("id", "v")
    val bad = df.select(
        AccessPatterns.unpackQuantized(
          AccessPatterns.packQuantized(col("v"), tol), tol).as("dec"),
        transform(col("v"), x =>
          AccessPatterns.quantize(x, tol).cast("float")).as("ref"))
      .where(not(col("dec") === col("ref")))
      .count()
    assert(bad == 0)
  }

  test("decode error is within tolerance and the payload is smaller than " +
      "float32 for smooth traces") {
    val v = (1 to 1000).map(i => (math.sin(i / 40.0) * 500.0).toFloat)
    val row = Seq(Tuple1(v)).toDF("v").select(
      AccessPatterns.packQuantized(col("v"), tol).as("enc"),
      col("v")).head()
    val enc = row.getAs[Array[Byte]]("enc")
    assert(enc.length == 5 + 4 * 1000) // pre-zstd layout is fixed-width
    assert((enc(4) & 0xff) >= 1, "a smooth trace must pick a predictor > 0")
    val dec = Seq(Tuple1(enc)).toDF("e")
      .select(AccessPatterns.unpackQuantized(col("e"), tol).as("d"))
      .as[Seq[Float]].head()
    v.zip(dec).foreach { case (x, d) => assert(math.abs(x - d) <= tol) }
    // the zigzag-residual planes of a smooth trace are almost all zeros
    assert(enc.drop(5 + 2 * 1000).forall(_ == 0),
      "planes 2-3 of a small-residual trace must be zero")
  }

  test("predictor order adapts per trace: constant→0-diff-dominated, " +
      "ramp→order>=1, and every order decodes exactly") {
    val traces = Seq(
      (1 to 64).map(_ => 5.0f),                       // constant
      (1 to 64).map(i => i * 2.0f),                   // linear ramp
      (1 to 64).map(i => (i * i / 4.0f)),             // quadratic
      (1 to 64).map(i => (math.sin(i / 3.0) * 100).toFloat)) // oscillatory
    val rows = traces.zipWithIndex.map(_.swap).toDF("id", "v")
      .select(col("id"), col("v"),
        AccessPatterns.packQuantized(col("v"), tol).as("enc"))
      .select(col("id"), col("v"),
        col("enc"),
        AccessPatterns.unpackQuantized(col("enc"), tol).as("dec"),
        transform(col("v"), x =>
          AccessPatterns.quantize(x, tol).cast("float")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("dec")) ==
        r.getSeq[Float](r.fieldIndex("ref")),
        s"decode mismatch on trace ${r.getInt(0)}")
      val order = r.getAs[Array[Byte]]("enc")(4) & 0xff
      assert(order <= 3)
      if (r.getInt(0) == 1) assert(order >= 1, "a ramp must not store raw indices")
    }
  }

  test("oversized indices and truncated payloads fail loudly") {
    val big = Seq(Tuple1(Seq(1e18f))).toDF("v")
      .select(AccessPatterns.packQuantized(col("v"), tol).as("e"))
    val e1 = intercept[Exception](big.head())
    assert(e1.getMessage != null)
    val trunc = Seq(Tuple1(Array[Byte](0, 0, 0, 5, 1, 2))).toDF("e")
      .select(AccessPatterns.unpackQuantized(col("e"), tol).as("d"))
    intercept[Exception](trunc.head())
  }

  test("quotients near 2^63 refuse loudly instead of truncating to a " +
      "small index that passes the 28-bit guard") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // 9.223372e18 / (2*0.25) = 2^64-ish: BigDecimal.longValue would
    // silently return 384 here — the pre-round magnitude gate must refuse
    val huge = Seq(Tuple1(Seq(9.223372e18f))).toDF("v")
      .select(AccessPatterns.packQuantized(col("v"), 0.25).as("e"))
    val e1 = intercept[Exception](huge.head())
    assert(msgs(e1).exists(m => m != null && m.contains("28 bits")))
    // finite value over a tiny tolerance → infinite quotient: same loud
    // refusal, not a cryptic NumberFormatException from BigDecimal
    val inf = Seq(Tuple1(Seq(1e12f))).toDF("v")
      .select(AccessPatterns.packQuantized(col("v"), 1e-300).as("e"))
    val e2 = intercept[Exception](inf.head())
    assert(msgs(e2).exists(m => m != null && m.contains("28 bits")))
  }

  test("a corrupt header whose 4*n wraps Int range is refused, not " +
      "allocated") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // n = 0x40000000: 5 + 4*n wraps to 5 in Int arithmetic, so a 5-byte
    // payload would "validate" and then try an 8 GiB allocation
    val evil = Seq(Tuple1(Array[Byte](0x40, 0, 0, 0, 0))).toDF("e")
      .select(AccessPatterns.unpackQuantized(col("e"), tol).as("d"))
    val e = intercept[Exception](evil.head())
    assert(msgs(e).exists(m => m != null && m.contains("payload length")))
  }

  test("wrong-typed inputs fail at analysis time") {
    import org.apache.spark.sql.AnalysisException
    val df = Seq((1, Seq(1, 2))).toDF("k", "vi")
    intercept[AnalysisException](
      df.select(AccessPatterns.packQuantized(col("vi"), tol))
        .queryExecution.analyzed)
    intercept[AnalysisException](
      df.select(AccessPatterns.unpackQuantized(col("k"), tol))
        .queryExecution.analyzed)
  }

  test("fuzz: random traces x random tolerances stay bit-identical to the " +
      "quantize column through pack->unpack") {
    val rng = new scala.util.Random(0xC0DEC)
    val tols = Seq(0.015625, 0.1, 0.25, 1.0, 3.7, 64.0)
    tols.foreach { t =>
      val traces = (0 until 10).map { _ =>
        val n = 1 + rng.nextInt(1600)
        (0 until n).map { _ =>
          // mix magnitudes: noise, mid-scale, and large-but-in-range
          val scale = rng.nextInt(3) match {
            case 0 => 1.0; case 1 => 1e3; case 2 => 1e6
          }
          ((rng.nextDouble() - 0.5) * scale).toFloat
        }
      }
      val bad = traces.zipWithIndex.map(_.swap).toDF("id", "v")
        .select(
          AccessPatterns.unpackQuantized(
            AccessPatterns.packQuantized(col("v"), t), t).as("dec"),
          transform(col("v"), x =>
            AccessPatterns.quantize(x, t).cast("float")).as("ref"))
        .where(not(col("dec") === col("ref")))
        .count()
      assert(bad == 0, s"pack/unpack diverged from quantize at tol $t")
    }
  }

  test("non-finite samples are refused with a clear error") {
    val df = Seq(Tuple1(Seq(1.0f, Float.NaN))).toDF("v")
      .select(AccessPatterns.packQuantized(col("v"), tol).as("e"))
    val e = intercept[Exception](df.head())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("non-finite")))
  }

  test("roundHalfUp matches Spark round() on a dense boundary sweep") {
    val xs = (-4000 to 4000).map(_ / 4.0) // every .25 in ±1000
    val sparkRound = xs.map(Tuple1(_)).toDF("x")
      .select(round(col("x")).as("r")).as[Double].collect()
    xs.zip(sparkRound).foreach { case (x, r) =>
      assert(QuantPackExprs.roundHalfUp(x) == r.toLong,
        s"HALF_UP divergence at $x")
    }
  }
}
