package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native kernels for per-trace seismic conditioning at REAL trace
  * lengths. The column-expression versions in [[graft.operators.TraceOps]]
  * built O(nSamples) expression trees — at the PostStack norm of ~1500
  * samples with a 121-sample AGC window that is ~1500 interpreted HOF
  * folds per row (Spark HOFs don't whole-stage-codegen) plus Janino
  * method-size fallback risk, and the stack carried 1500 decimal agg
  * buffers per group. Each kernel below is ONE expression node whose loop
  * runs in compiled JVM code per row, with the identical operation order
  * as the column formulas it replaces (left-to-right folds, correctly
  * rounded sqrt, Spark-cast double→decimal), so results stay
  * bit-deterministic and oracle-replayable at any trace length.
  *
  * Reference anchor: the reference stores ~1500-sample traces per
  * `templates/seismic_3d_poststack.py:17` (t chunk 128, real files ship
  * 1000+ samples) — these kernels are what make the conditioning tier
  * real at that geometry rather than at the 3–4-sample fixture shape.
  */
object TraceExprs {

  def agc(samples: Column, window: Int): Column =
    ColumnBridge.column(AgcExpr(ColumnBridge.expression(samples), window))

  def muteTop(samples: Column, firstLive: Int): Column =
    ColumnBridge.column(MuteTopExpr(ColumnBridge.expression(samples), firstLive))

  def firFilter(samples: Column, coeffs: Seq[Double], center: Int): Column =
    ColumnBridge.column(FirFilterExpr(
      ColumnBridge.expression(samples), coeffs.toIndexedSeq, center))

  def shiftResample(samples: Column, shift: Column): Column =
    ColumnBridge.column(ShiftResampleExpr(
      ColumnBridge.expression(samples), ColumnBridge.expression(shift)))

  /** `df.groupBy(keys).agg(TraceExprs.stack(col("samples")))` →
    * struct<n_traces: long, stack: array<double>>.
    */
  def stack(samples: Column): Column =
    ColumnBridge.column(
      StackAgg(ColumnBridge.expression(samples)).toAggregateExpression())

  /** `df.groupBy(keys).agg(TraceExprs.moveoutStack(samples, offset,
    * cands))` → struct<best_shift, n_traces, energy, stack> — the fused
    * linear moveout scan (see [[MoveoutStackAgg]]). `offset` must be
    * double.
    */
  def moveoutStack(samples: Column, offset: Column,
                   candidates: Seq[Double],
                   semblance: Boolean = false): Column =
    ColumnBridge.column(
      MoveoutStackAgg(ColumnBridge.expression(samples),
        ColumnBridge.expression(offset),
        candidates.toIndexedSeq, semblance).toAggregateExpression())

  /** `df.groupBy(keys).agg(TraceExprs.semblancePanel(samples, offset,
    * cands, window))` → struct<n_traces, shifts, panels> — the full
    * windowed-semblance velocity spectrum (see [[MoveoutPanelAgg]]).
    */
  def semblancePanel(samples: Column, offset: Column,
                     candidates: Seq[Double], window: Int): Column =
    ColumnBridge.column(
      MoveoutPanelAgg(ColumnBridge.expression(samples),
        ColumnBridge.expression(offset),
        candidates.toIndexedSeq, window).toAggregateExpression())

  /** Elementwise `(x % m).toDouble` over an `array<bigint>` — ONE node.
    * The `transform(arr, x => (x % m).cast(double))` HOF it replaces is
    * interpreted per ELEMENT (Spark HOFs don't codegen): over a
    * 1000-sample trace table that lambda dominated the whole query
    * (~150 s of a 153 s run at sf0.1). Generic modular binning; also the
    * honest way to build bounded synthetic traces from an arithmetic
    * `sequence()` without paying an interpreted fold per sample.
    */
  def longModToDouble(arr: Column, m: Long): Column =
    ColumnBridge.column(LongModToDoubleExpr(ColumnBridge.expression(arr), m))

  /** Analysis-time type gate shared by the conditioning kernels: the
    * samples child must be `array<float|double>`. Without this the
    * wrong-typed input only failed at EXECUTION time inside
    * [[VecExprs.isFloatArray]] — inconsistent with
    * [[LongModToDoubleExpr]]/[[ShiftResampleExpr]], which checked.
    */
  private[functions] def checkSamplesType(
      prettyName: String, samples: Expression): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    samples.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> samples, got $t")
    }

  /** Fail-loud element read: a null sample inside a trace is data
    * corruption for the conditioning kernels, not a maskable value.
    */
  private[functions] def elemStrict(name: String, a: ArrayData, i: Int,
                                    isFloat: Boolean): Double = {
    if (a.isNullAt(i)) throw new IllegalArgumentException(
      s"$name: null sample at position ${i + 1} — conditioning kernels " +
        "need dense traces (mask dead traces upstream)")
    VecExprs.elem(a, i, isFloat)
  }
}

/** See [[TraceExprs.longModToDouble]]. Elements must be non-null longs. */
final case class LongModToDoubleExpr(child: Expression, m: Long)
    extends UnaryExpression with Serializable {
  require(m > 0, s"modulus must be positive, got $m")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "long_mod_to_double"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<bigint>, got $t")
    }

  def kernel(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$prettyName: null element at position ${i + 1}")
      out(i) = (a.getLong(i) % m).toDouble
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("modself", this, classOf[LongModToDoubleExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
  }

  override protected def withNewChildInternal(c: Expression): LongModToDoubleExpr =
    copy(child = c)
}

/** Automatic gain control, one node: out[i] = v[i] / rms(window centered
  * at i, clipped at edges), 0.0 when the window RMS is 0 (dead window).
  * The per-window sum of squares folds LEFT-TO-RIGHT over the window —
  * the same association as the `aggregate(slice(...))` column formula and
  * the oracle's spelled-out additions — so outputs are bit-identical to
  * the expression-tree version at every trace length. O(n·window) fused
  * multiply-adds per row in compiled code (~180k flops at n=1500, w=121:
  * memory-bandwidth noise next to the interpreted-fold version).
  */
final case class AgcExpr(child: Expression, window: Int)
    extends UnaryExpression with Serializable {
  require(window >= 1 && window % 2 == 1, s"AGC window must be odd, got $window")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "trace_agc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TraceExprs.checkSamplesType(prettyName, child)

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)

  def kernel(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val half = window / 2
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = TraceExprs.elemStrict(prettyName, a, i, isFloat); i += 1
    }
    val out = new Array[Double](n)
    // INTEGRAL fast path — O(n) sliding sum instead of the O(n·window)
    // fold: when every sample is integer-valued with |x| ≤ 2²⁰ and the
    // window ≤ 2¹³, every windowed Σx² is an exact integer ≤ 2⁵³, so the
    // double fold, the long sliding accumulator, and any other order all
    // produce the SAME exact value — bit-identical output, 40× fewer ops
    // at window 121. (SEG-Y fixed-point formats 1/2/3/8 land here; fully
    // fractional data keeps the direct fold below, whose left-to-right
    // order the oracle replays.)
    var allInt = window <= 8191
    i = 0
    while (allInt && i < n) {
      val x = v(i)
      allInt = x == math.rint(x) && math.abs(x) <= 1048576.0
      i += 1
    }
    if (allInt) {
      // squares recomputed on window entry/exit (each element exactly
      // twice) — a per-row squares array would be 8 KB of allocation
      // per 1000-sample row, which measurably GC-bound the long query
      var acc = 0L
      var lo = 0
      var hi = -1 // inclusive live window [lo, hi]
      i = 0
      while (i < n) {
        val nLo = math.max(0, i - half)
        val nHi = math.min(n - 1, i + half)
        while (hi < nHi) { hi += 1; val l = v(hi).toLong; acc += l * l }
        while (lo < nLo) { val l = v(lo).toLong; acc -= l * l; lo += 1 }
        val rms = math.sqrt(acc.toDouble / (nHi - nLo + 1).toDouble)
        out(i) = if (rms > 0.0) v(i) / rms else 0.0
        i += 1
      }
    } else {
      i = 0
      while (i < n) {
        val lo = math.max(0, i - half)
        val hi = math.min(n - 1, i + half)
        var acc = 0.0
        var j = lo
        while (j <= hi) { acc += v(j) * v(j); j += 1 }
        val rms = math.sqrt(acc / (hi - lo + 1).toDouble)
        out(i) = if (rms > 0.0) v(i) / rms else 0.0
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("agcself", this, classOf[AgcExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
  }

  override protected def withNewChildInternal(c: Expression): AgcExpr =
    copy(child = c)
}

/** Time-domain FIR convolution, one node: out[i] = Σ_k coeffs(k) ·
  * v(i + k − center) with reads beyond the trace as 0 (the mute
  * convention) — the wavelet smoothing/sharpening primitive (boxcar,
  * binomial, Ricker-like taps). The tap fold runs LEFT-TO-RIGHT in k,
  * so integer-valued fixtures replay exactly in any engine. Taps are a
  * plan-time constant (a filter is survey metadata, not data).
  */
final case class FirFilterExpr(child: Expression, coeffs: IndexedSeq[Double],
                               center: Int)
    extends UnaryExpression with Serializable {
  require(coeffs.nonEmpty, "FIR filter needs at least one tap")
  require(center >= 0 && center < coeffs.length,
    s"center must index the taps (0..${coeffs.length - 1}), got $center")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "trace_fir"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TraceExprs.checkSamplesType(prettyName, child)

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)
  // taps as Seq in the CASE-CLASS FIELD so equals/hashCode are structural
  // (an Array field compares by reference identity, defeating Catalyst
  // canonicalization/subexpression elimination); one Array conversion
  // here keeps the hot loop on primitive indexing
  @transient private lazy val taps: Array[Double] = coeffs.toArray

  def kernel(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = TraceExprs.elemStrict(prettyName, a, i, isFloat); i += 1
    }
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      var acc = 0.0
      var k = 0
      while (k < taps.length) {
        val j = i + k - center
        // ALWAYS add the product (with a 0.0 read beyond the trace):
        // skipping instead would diverge from the oracle's
        // `c·coalesce(v,0)` in the SIGN of zero (acc + c·0 can flip
        // -0.0 → +0.0), and the hash compare distinguishes those
        acc += taps(k) * (if (j >= 0 && j < n) v(j) else 0.0)
        k += 1
      }
      out(i) = acc
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("firself", this, classOf[FirFilterExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
  }

  override protected def withNewChildInternal(c: Expression): FirFilterExpr =
    copy(child = c)
}

/** Top mute, one node: 1-based positions strictly before `firstLive`
  * zero; the rest pass through as double.
  */
final case class MuteTopExpr(child: Expression, firstLive: Int)
    extends UnaryExpression with Serializable {
  require(firstLive >= 1, s"firstLive must be >= 1, got $firstLive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "trace_mute_top"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TraceExprs.checkSamplesType(prettyName, child)

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)

  def kernel(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (i + 1 < firstLive) 0.0
        else TraceExprs.elemStrict(prettyName, a, i, isFloat)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("muteself", this, classOf[MuteTopExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
  }

  override protected def withNewChildInternal(c: Expression): MuteTopExpr =
    copy(child = c)
}

/** Fractional static shift by linear interpolation, one node: position
  * `i + shift` (1-based) resamples as `v0 + (v1 − v0) · f` with reads
  * outside the trace as 0 — the EXACT operation order of the column
  * formula (floor → int truncation → frac → lerp), so dyadic shifts stay
  * bit-exact against the oracle.
  */
final case class ShiftResampleExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "trace_shift_resample"

  @transient private lazy val isFloat = VecExprs.isFloatArray(left)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val samplesCheck = TraceExprs.checkSamplesType(prettyName, left)
    if (samplesCheck.isFailure) samplesCheck
    else right.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName shift must be double, got $t")
    }
  }

  def kernel(a: ArrayData, shift: Double): ArrayData = {
    val n = a.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = TraceExprs.elemStrict(prettyName, a, i, isFloat); i += 1
    }
    def at(j: Int): Double = if (j >= 1 && j <= n) v(j - 1) else 0.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val pos = (i + 1).toDouble + shift
      val i0 = math.floor(pos).toInt // the column formula's floor→int cast
      val f = pos - i0.toDouble
      val v0 = at(i0)
      val v1 = at(i0 + 1)
      out(i) = v0 + (v1 - v0) * f
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(a: Any, s: Any): Any =
    kernel(a.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shiftself", this, classOf[ShiftResampleExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, s) => s"${ev.value} = $ref.kernel($a, $s);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShiftResampleExpr =
    copy(left = l, right = r)
}

/** Mutable buffer for [[StackAgg]]: trace count + per-position exact
  * sums. Three regimes, switched per BUFFER, never per position, and
  * only ever forward (long → fast10 → decimal):
  *  - LONG (`longSums != null`): every value seen so far was
  *    integer-valued with |x| ≤ 2⁴⁰ and fewer than 4M rows accumulated,
  *    so the per-position sums are exact signed longs (no allocation,
  *    no BigDecimal churn — 3 allocations/sample in the all-decimal
  *    first cut made a 600 M-sample stack spend its time in GC);
  *  - FAST10 (`f10Hi/f10Lo != null`): every value was in the PROVABLE
  *    fixed-point set of [[StackBuffer.q10]] (a multiple of 2⁻¹⁰ with
  *    |x| < 2¹⁸ — fractional moveout shifts of integer traces land
  *    here), so the per-position sums are exact scale-10 numerators in
  *    signed 128-bit (hi, lo) pairs. Same zero-allocation update as
  *    long mode; BigDecimal.valueOf's Double.toString+parse per sample
  *    in decimal mode is ~10³ slower and made the velocity-panel query
  *    GC-bound (9–46 s same-run spreads at sf0.1);
  *  - DECIMAL (`decSums != null`): the general exact path at scale 10.
  * Each promotion is exact: an integer sum s IS the numerator s·10¹⁰
  * (128-bit product), which IS the decimal s.0000000000.
  * Arrays are null until the first trace fixes the length.
  */
final class StackBuffer(var n: Long, var longSums: Array[Long],
                        var decSums: Array[JBigDecimal])
    extends Serializable {
  /** FAST10 per-position signed 128-bit scale-10 numerators. */
  var f10Hi: Array[Long] = null
  var f10Lo: Array[Long] = null

  def length: Int =
    if (decSums != null) decSums.length
    else if (f10Hi != null) f10Hi.length
    else if (longSums != null) longSums.length else -1

  /** Exact long→fast10 promotion (no-op unless in long/empty mode):
    * each signed long sum s becomes the 128-bit product s · 10¹⁰.
    */
  def promoteToF10(len: Int): Unit = if (f10Hi == null && decSums == null) {
    f10Hi = new Array[Long](len)
    f10Lo = new Array[Long](len)
    if (longSums != null) {
      var i = 0
      while (i < len) {
        val s = longSums(i)
        f10Lo(i) = s * StackBuffer.E10
        f10Hi(i) = Math.multiplyHigh(s, StackBuffer.E10)
        i += 1
      }
      longSums = null
    }
  }

  /** Exact promotion to decimal mode (no-op in decimal mode). */
  def promote(): Unit = if (decSums == null) {
    decSums =
      if (f10Hi != null)
        Array.tabulate(f10Hi.length)(i =>
          new JBigDecimal(SqAcc.toBigInt(f10Hi(i), f10Lo(i)), 10))
      else if (longSums == null) null
      else longSums.map(v => JBigDecimal.valueOf(v).setScale(10))
    longSums = null; f10Hi = null; f10Lo = null
  }
}

/** The ONE numeric path for exact trace stacking, shared by [[StackAgg]]
  * and [[MoveoutStackAgg]] so the fused moveout scan is bit-identical to
  * the explode→shift→stack composition it replaces (same long-mode
  * acceptance, same scale-10 HALF_UP value quantization, same
  * sum→double conversion).
  */
object StackBuffer {
  // LONG-mode acceptance: integer-valued, |x| ≤ 2⁴⁰, and < 4M rows in the
  // buffer — then every per-position sum stays < 2⁶², overflow-free
  val MaxLongAbs: Long = 1L << 40
  val MaxLongRows: Long = 4L * 1000 * 1000

  /** 10¹⁰, as the two exact factors 2¹⁰ · 5¹⁰ = 1024 · 9765625. */
  val E10: Long = 10000000000L
  private val E10Odd: Long = 9765625L // 5¹⁰ = 10¹⁰ / 1024
  /** Sentinel for "no provable fast-path numerator" (a real numerator
    * can never be it: |q| ≤ 2¹⁸·10¹⁰ ≪ 2⁶³).
    */
  val Q10Sentinel: Long = Long.MinValue
  /** FAST10 magnitude bound 2¹⁸ — see [[q10]]'s proof. */
  private val F10MaxAbs: Double = 262144.0

  /** The exact scale-10 numerator of
    * `BigDecimal.valueOf(x).setScale(10, HALF_UP)` — i.e. of the decimal
    * quantization the DECIMAL mode applies per value — computed in pure
    * long arithmetic, or [[Q10Sentinel]] when x is outside the provable
    * set. Fast set: x a multiple of 2⁻¹⁰ with |x| < 2¹⁸ (covers integers
    * and the k/1024 lerp fractions moveout shifts produce).
    *
    * Proof the two agree on the fast set: such x has the exact decimal
    * expansion (x·1024)·5¹⁰ / 10¹⁰ — at most 10 fractional digits — so
    * the exact numerator is the integer (x·1024)·9765625. valueOf goes
    * through Double.toString's SHORTEST round-tripping decimal s, which
    * satisfies |s − x| ≤ ulp(x)/2 ≤ 2⁻³⁵ (|x| < 2¹⁸), i.e.
    * |s·10¹⁰ − numerator| ≤ 0.146 < 0.5 — strictly inside the HALF_UP
    * rounding cell of the same integer. Both multiplications (x·1024 a
    * power-of-two scaling of a double, int·9765625 within 2⁵² in long)
    * are exact.
    */
  @inline def q10(x: Double): Long = {
    val t = x * 1024.0
    if (math.abs(x) < F10MaxAbs && t == math.rint(t)) t.toLong * E10Odd
    else Q10Sentinel
  }

  /** `BigDecimal.valueOf(x).setScale(10, HALF_UP)`, string-free when x
    * is in [[q10]]'s fast set (valueOf(long, scale) skips the
    * Double.toString+parse round-trip — the decimal hot path's cost).
    */
  def decQ(x: Double): JBigDecimal = {
    val q = q10(x)
    if (q != Q10Sentinel) JBigDecimal.valueOf(q, 10)
    else JBigDecimal.valueOf(x).setScale(10, RoundingMode.HALF_UP)
  }

  /** Accumulate one trace (already read into a dense double array; only
    * the first `len` entries are live). Returns the row's mode so a
    * mode-paired Σx² accumulator can square the SAME exact values:
    * 0 = long, 1 = fast10 (`qNums(0..len-1)` now hold the row's exact
    * scale-10 numerators), 2 = decimal. `qNums` must have ≥ len slots.
    */
  def addWithQ(b: StackBuffer, xs: Array[Double], len: Int,
               qNums: Array[Long]): Int = {
    require(b.length < 0 || b.length == len,
      s"stack: trace lengths differ within a group (${b.length} vs $len)")
    var mode = 2
    if (b.decSums == null) {
      // one classification pass: long-mode acceptance and the fast-path
      // numerators together, each short-circuiting independently
      var longOk = b.f10Hi == null && b.n < MaxLongRows
      var fastOk = true
      var i = 0
      while (i < len && (longOk || fastOk)) {
        val x = xs(i)
        if (longOk && !(x == math.rint(x) && math.abs(x) <= MaxLongAbs))
          longOk = false
        if (fastOk) {
          val q = q10(x)
          if (q == Q10Sentinel) fastOk = false else qNums(i) = q
        }
        i += 1
      }
      mode = if (longOk) 0 else if (fastOk) 1 else 2
    }
    if (mode == 0) {
      if (b.longSums == null) b.longSums = new Array[Long](len)
      var i = 0
      while (i < len) { b.longSums(i) += xs(i).toLong; i += 1 }
    } else if (mode == 1) {
      if (b.f10Hi == null) b.promoteToF10(len)
      val hi = b.f10Hi; val lo = b.f10Lo
      var i = 0
      while (i < len) {
        // signed 128-bit += sign-extended qNums(i)
        val v = qNums(i)
        val newLo = lo(i) + v
        if (java.lang.Long.compareUnsigned(newLo, lo(i)) < 0) hi(i) += 1
        lo(i) = newLo
        hi(i) += (v >> 63)
        i += 1
      }
    } else {
      b.promote()
      if (b.decSums == null) b.decSums = Array.fill(len)(JBigDecimal.ZERO)
      var i = 0
      while (i < len) {
        b.decSums(i) = b.decSums(i).add(decQ(xs(i)))
        i += 1
      }
    }
    b.n += 1
    mode
  }

  /** Merge `o` into `b` (exact in every mode pairing; the result mode is
    * the weaker of the two — long+long over the row cap and any fast10
    * pairing merge as fast10 128-bit sums, which any long sum converts
    * to exactly).
    */
  def mergeInto(b: StackBuffer, o: StackBuffer): Unit = {
    if (o.length < 0) return
    if (b.length < 0) {
      b.longSums = o.longSums; b.f10Hi = o.f10Hi; b.f10Lo = o.f10Lo
      b.decSums = o.decSums; b.n = o.n
      return
    }
    require(b.length == o.length,
      s"stack: trace lengths differ across partitions (${b.length} vs ${o.length})")
    val len = b.length
    if (b.decSums == null && o.decSums == null &&
        b.f10Hi == null && o.f10Hi == null && b.n + o.n <= MaxLongRows) {
      var i = 0
      while (i < len) { b.longSums(i) += o.longSums(i); i += 1 }
    } else if (b.decSums == null && o.decSums == null) {
      b.promoteToF10(len); o.promoteToF10(len)
      var i = 0
      while (i < len) {
        val nLo = b.f10Lo(i) + o.f10Lo(i)
        if (java.lang.Long.compareUnsigned(nLo, b.f10Lo(i)) < 0) b.f10Hi(i) += 1
        b.f10Lo(i) = nLo
        b.f10Hi(i) += o.f10Hi(i)
        i += 1
      }
    } else {
      b.promote(); o.promote()
      var i = 0
      while (i < len) {
        b.decSums(i) = b.decSums(i).add(o.decSums(i)); i += 1
      }
    }
    b.n += o.n
  }

  /** Per-position mean as double — sum→double correctly rounded
    * (long.toDouble == parseDouble of the decimal's plain string for
    * integer sums), then the double-by-double division of the column
    * plan.
    */
  def meanArray(b: StackBuffer): Array[Double] = {
    val len = math.max(0, b.length)
    val out = new Array[Double](len)
    var i = 0
    while (i < len) {
      val sumD =
        if (b.decSums != null)
          java.lang.Double.parseDouble(b.decSums(i).toPlainString)
        else if (b.f10Hi != null)
          java.lang.Double.parseDouble(new JBigDecimal(
            SqAcc.toBigInt(b.f10Hi(i), b.f10Lo(i)), 10).toPlainString)
        else b.longSums(i).toDouble
      out(i) = sumD / b.n.toDouble
      i += 1
    }
    out
  }

  def write(out: DataOutputStream, b: StackBuffer): Unit = {
    out.writeLong(b.n)
    out.writeInt(b.length)
    if (b.decSums != null) {
      out.writeByte(1)
      b.decSums.foreach(d => out.writeUTF(d.toPlainString))
    } else if (b.f10Hi != null) {
      out.writeByte(2)
      SqAcc.writeLongs(out, b.f10Hi)
      SqAcc.writeLongs(out, b.f10Lo)
    } else if (b.longSums != null) {
      out.writeByte(0)
      SqAcc.writeLongs(out, b.longSums)
    }
  }

  def read(in: DataInputStream): StackBuffer = {
    val n = in.readLong()
    val len = in.readInt()
    if (len < 0) new StackBuffer(n, null, null)
    else in.readByte() match {
      case 1 =>
        new StackBuffer(n, null,
          Array.fill(len)(new JBigDecimal(in.readUTF())))
      case 2 =>
        val b = new StackBuffer(n, null, null)
        b.f10Hi = SqAcc.readLongs(in, len)
        b.f10Lo = SqAcc.readLongs(in, len)
        b
      case _ => new StackBuffer(n, SqAcc.readLongs(in, len), null)
    }
  }
}

/** The CDP stack as ONE aggregate: traces sharing a group average
  * element-wise. Per-position sums accumulate in BigDecimal at scale 10
  * via the same double→decimal path Spark's cast uses (shortest string,
  * HALF_UP) — exact, hence order-independent and bit-identical to the
  * per-column `sum(cast(x as DECIMAL(28,10)))` plan it replaces; the
  * final mean is (decimal→double) / (count→double), both correctly
  * rounded. The shuffle carries one serialized buffer per group per map
  * partition — the same decimal volume as the old 1500-agg-column plan,
  * with none of the expression-tree or Janino cost.
  */
case class StackAgg(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[StackBuffer] with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_traces", LongType, nullable = false),
    StructField("stack", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TraceExprs.checkSamplesType("trace_stack", child)

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)

  // per-task row scratch (expression instances are task-local): reusing
  // it saves an 8 KB young-gen allocation per 1000-sample row — ~5 GB of
  // churn over a sf0.1 long-trace query
  @transient private var scratch: Array[Double] = null
  @transient private var qScratch: Array[Long] = null

  override def createAggregationBuffer(): StackBuffer =
    new StackBuffer(0L, null, null)

  override def update(b: StackBuffer, input: InternalRow): StackBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (scratch == null || scratch.length < n) {
        scratch = new Array[Double](n)
        qScratch = new Array[Long](n)
      }
      val xs = scratch
      var i = 0
      while (i < n) {
        xs(i) = TraceExprs.elemStrict("trace_stack", a, i, isFloat); i += 1
      }
      StackBuffer.addWithQ(b, xs, n, qScratch): Unit
    }
    b
  }

  override def merge(b: StackBuffer, o: StackBuffer): StackBuffer = {
    StackBuffer.mergeInto(b, o)
    b
  }

  override def eval(b: StackBuffer): Any =
    InternalRow(b.n,
      UnsafeArrayData.fromPrimitiveArray(StackBuffer.meanArray(b)))

  override def serialize(b: StackBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(32 + 16 * math.max(0, b.length))
    val out = new DataOutputStream(bos)
    StackBuffer.write(out, b)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): StackBuffer =
    StackBuffer.read(new DataInputStream(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(o: Int): StackAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StackAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): StackAgg =
    copy(child = c)
}

/** Exact Σx² accumulator, mode-paired with a [[StackBuffer]]: while the
  * stack is in long mode the squares accumulate as an UNSIGNED 128-bit
  * integer at scale 0 (x ≤ 2⁴⁰ ⇒ x² ≤ 2⁸⁰ overflows a long; 4M rows ×
  * 1000 positions × 2⁸⁰ still fits 2¹²⁸ with room); while it is in
  * FAST10 mode the squares are the scale-20 products of the SAME exact
  * scale-10 numerators (q² fits 2¹⁰⁴, unsigned 128-bit at scale 20 with
  * an overflow guard that promotes to decimal near 2¹²⁰ — unreachable
  * below ~10⁵ maximal-magnitude rows); and in decimal mode they are the
  * scale-20 BigDecimal products of the SAME scale-10 HALF_UP quantized
  * values the stack sums. Every promotion is exact, so the semblance
  * denominator is an exact rational in every mode, bit-reproducible
  * under any merge order.
  */
final class SqAcc(var hi: Long, var lo: Long, var dec: JBigDecimal)
    extends Serializable {
  /** true → the 128-bit value is a scale-20 numerator (FAST20 mode);
    * false → a scale-0 integer (long mode). Meaningless once `dec` set.
    */
  var sc20: Boolean = false

  private def add128(pHi: Long, pLo: Long): Unit = {
    val newLo = lo + pLo
    if (java.lang.Long.compareUnsigned(newLo, lo) < 0) hi += 1
    lo = newLo
    hi += pHi
  }

  /** += v² (long mode; v integer-valued, |v| ≤ 2⁴⁰). */
  def addLong(v: Long): Unit = add128(Math.multiplyHigh(v, v), v * v)

  /** += q² where q is an exact scale-10 numerator (FAST20 mode, with
    * guard-promotion to decimal; dispatches to the decimal arm if a
    * guard already promoted this accumulator).
    */
  def addQ(q: Long): Unit =
    if (dec != null) dec = dec.add(SqAcc.decSq(q))
    else {
      if (java.lang.Long.compareUnsigned(hi, SqAcc.F20GuardHi) >= 0) {
        promote()
        dec = dec.add(SqAcc.decSq(q))
      } else add128(Math.multiplyHigh(q, q), q * q)
    }

  /** += q² (decimal mode; q already scale-10 quantized). */
  def addDec(q: JBigDecimal): Unit = dec = dec.add(q.multiply(q))

  /** Enter FAST20 mode: exact when the scale-0 total is small enough to
    * multiply by 10²⁰ inside 128 bits (≤ 2⁶⁰ — the common case: a few
    * integer-mode rows before the first fractional shift); otherwise
    * promotes to decimal, which addQ then feeds exactly. No-op if
    * already FAST20 or decimal.
    */
  def ensureF20(): Unit =
    if (dec == null && !sc20) {
      if (hi == 0L && lo >= 0L && lo <= SqAcc.MaxSc0ToF20) {
        val h1 = Math.multiplyHigh(lo, StackBuffer.E10)
        val l1 = lo * StackBuffer.E10
        val h2 = h1 * StackBuffer.E10 + SqAcc.uMulHighE10(l1)
        val l2 = l1 * StackBuffer.E10
        hi = h2; lo = l2; sc20 = true
      } else promote()
    }

  def toBigDecimal: JBigDecimal =
    if (dec != null) dec
    else if (sc20) new JBigDecimal(SqAcc.toBigInt(hi, lo), 20)
    else new JBigDecimal(SqAcc.toBigInt(hi, lo)).setScale(20)

  /** Exact 128-bit → decimal promotion (no-op in decimal mode). */
  def promote(): Unit = if (dec == null) {
    dec = toBigDecimal
    hi = 0L; lo = 0L; sc20 = false
  }

  def mergeFrom(o: SqAcc): Unit = {
    if (dec == null && o.dec == null && sc20 != o.sc20) {
      // align scales first: upscale the scale-0 side (exact or, if too
      // big, a decimal promotion the re-check below routes correctly)
      if (!sc20) ensureF20() else o.ensureF20()
    }
    // merge guard: addQ's per-add guard bounds ONE buffer below ~2^120,
    // but merges COMPOSE (one partial per map partition) — unguarded,
    // ~2^7 guard-limit partials walk the total past 2^127 where the
    // signed hi read turns Σx² negative. Promote to decimal instead.
    if (dec == null && o.dec == null &&
        java.lang.Long.compareUnsigned(hi, SqAcc.MergeGuardHi) < 0 &&
        java.lang.Long.compareUnsigned(o.hi, SqAcc.MergeGuardHi) < 0)
      add128(o.hi, o.lo)
    else { promote(); dec = dec.add(o.toBigDecimal) }
  }
}

object SqAcc {
  def empty(): SqAcc = new SqAcc(0L, 0L, null)

  /** FAST20 guard: promote before an add once hi reaches 2⁵⁶ (value
    * ≥ 2¹²⁰) — each q² add is < 2¹⁰⁵, leaving > 2²² adds of headroom
    * before 128-bit wrap, and the first guarded add promotes.
    */
  val F20GuardHi: Long = 1L << 56
  /** MERGE guard: a pairwise 128-bit merge is safe only while both
    * sides are < 2¹²⁶ (sum < 2¹²⁷, the signed-hi ceiling); sides at or
    * above promote to decimal. Large enough that the long-mode bound
    * (4M rows × 1000 positions × 2⁸⁰ = 2¹²²) and any single guarded
    * FAST20 buffer never trip it.
    */
  val MergeGuardHi: Long = 1L << 62
  /** Largest scale-0 128-bit total that upscales to scale 20 inside
    * 128 bits: 2⁶⁰ · 10²⁰ < 2¹²⁷.
    */
  val MaxSc0ToF20: Long = 1L << 60

  /** Unsigned-high-word of a · 10¹⁰ (Java 17 has no
    * Math.unsignedMultiplyHigh; the positive-multiplier correction term
    * suffices).
    */
  @inline def uMulHighE10(a: Long): Long =
    Math.multiplyHigh(a, StackBuffer.E10) + ((a >> 63) & StackBuffer.E10)

  /** q² as an exact scale-20 decimal, through the 128-bit product
    * (q² can exceed 2⁶³).
    */
  def decSq(q: Long): JBigDecimal =
    new JBigDecimal(toBigInt(Math.multiplyHigh(q, q), q * q), 20)

  def toBigInt(hi: Long, lo: Long): java.math.BigInteger =
    java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))

  /** Bulk big-endian long-array write — byte-identical to a writeLong
    * loop, without DataOutputStream's per-value path: the velocity-panel
    * profile showed BUFFER SERIALIZATION (≈64k writeLong calls per
    * partial buffer, 2048 buffers a pass at sf0.1), not arithmetic, as
    * the wall once the fixed-point tier landed.
    */
  def writeLongs(out: DataOutputStream, a: Array[Long]): Unit = {
    val bytes = new Array[Byte](a.length * 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().put(a)
    out.write(bytes)
  }

  def readLongs(in: DataInputStream, len: Int): Array[Long] = {
    val bytes = new Array[Byte](len * 8)
    in.readFully(bytes)
    val a = new Array[Long](len)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(a)
    a
  }

  def write(out: DataOutputStream, s: SqAcc): Unit =
    if (s.dec != null) { out.writeByte(1); out.writeUTF(s.dec.toPlainString) }
    else {
      out.writeByte(if (s.sc20) 2 else 0)
      out.writeLong(s.hi); out.writeLong(s.lo)
    }

  def read(in: DataInputStream): SqAcc = in.readByte() match {
    case 1 => new SqAcc(0L, 0L, new JBigDecimal(in.readUTF()))
    case 2 =>
      val s = new SqAcc(in.readLong(), in.readLong(), null)
      s.sc20 = true
      s
    case _ => new SqAcc(in.readLong(), in.readLong(), null)
  }
}

/** Aggregation state of [[MoveoutStackAgg]]: one exact-sum stack per
  * candidate, plus (semblance mode only) one exact Σx² per candidate.
  */
final class MoveoutBuffer(val stacks: Array[StackBuffer],
                          val sqs: Array[SqAcc]) extends Serializable

/** The FUSED linear moveout scan: `groupBy(cell).agg(MoveoutStackAgg(
  * samples, offset, candidates))` computes, in ONE aggregate, what the
  * explode(candidates) → ShiftResampleExpr → StackAgg → window-argmax
  * composition computes — and is bit-identical to it, because every
  * numeric step is the SAME code: the lerp is [[ShiftResampleExpr]]'s
  * formula verbatim (floor → int cast → frac → `v0 + (v1−v0)·f`, reads
  * outside the trace as 0), the per-candidate sums go through
  * [[StackBuffer.addWithQ]] (the one shared exact-stacking path), the stacked
  * mean through [[StackBuffer.meanArray]], the energy is [[DotExpr]]'s
  * left fold of the mean with itself, and ties resolve to the smallest
  * candidate (ascending scan, strict `>` replaces — the
  * `orderBy(energy desc, cand asc)` row_number()=1 rule).
  *
  * Why fuse: the composed plan materializes |candidates| shifted copies
  * of every trace as rows (at 16 candidates × 1000 samples that is
  * 16 × 8 KB of UnsafeArrayData per input trace, plus 16 explode-row
  * copies and 16 aggregate re-reads) before map-side combine throws the
  * rows away. The fused update reads the trace ONCE and adds each
  * candidate's lerped samples straight into the per-candidate buffers —
  * two O(nSamples) scratch allocations per row total, zero intermediate
  * rows. The shuffle volume is unchanged (|candidates| exact-sum buffers
  * per cell per map partition — never the traces), and the window
  * operator disappears from the plan entirely.
  *
  * Null semantics match the composition: a null samples array or null
  * offset made every exploded row's shifted array null, which
  * [[StackAgg]] skipped in all candidate groups — here the row is
  * skipped whole. Output: struct<best_shift, n_traces, energy, stack>.
  *
  * `semblance = true` switches the coherence measure from stack energy
  * to SEMBLANCE — the velocity-analysis standard: S(c) = Σ_t (Σ_i a)² /
  * (N · Σ_t Σ_i a²), stacked energy over total energy, in [0, 1] for
  * real gathers. Unlike the energy fold (a 1000-term double sum, which
  * is why the long energy row only hash-checks the argmax), BOTH
  * semblance folds are EXACT: the numerator squares the per-position
  * exact sums the stack already holds, the denominator is [[SqAcc]]'s
  * exact Σx² — the only floating steps are the two final decimal→double
  * casts and one divide, each correctly rounded, so the semblance DOUBLE
  * itself is hash-checkable against a decimal-arithmetic oracle at any
  * trace length. The output field is then named `semblance`.
  */
case class MoveoutStackAgg(samples: Expression, offset: Expression,
                           candidates: IndexedSeq[Double],
                           semblance: Boolean = false,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MoveoutBuffer]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  require(candidates.nonEmpty, "moveout scan needs at least one candidate")

  override def left: Expression = samples
  override def right: Expression = offset
  override def nullable: Boolean = false
  override def prettyName: String =
    if (semblance) "trace_moveout_semblance" else "trace_moveout_stack"

  override def dataType: DataType = StructType(Seq(
    StructField("best_shift", DoubleType, nullable = false),
    StructField("n_traces", LongType, nullable = false),
    StructField(if (semblance) "semblance" else "energy", DoubleType,
      nullable = false),
    StructField("stack", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val samplesCheck = TraceExprs.checkSamplesType(prettyName, samples)
    if (samplesCheck.isFailure) samplesCheck
    else offset.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName offset must be double, got $t")
    }
  }

  @transient private lazy val isFloat = VecExprs.isFloatArray(samples)
  @transient private lazy val cands: Array[Double] = candidates.toArray

  // per-task row scratch (expression instances are task-local): the trace
  // and its shifted image are each 8 KB at 1000 samples — reuse instead
  // of 2 allocations per row
  @transient private var trScratch: Array[Double] = null
  @transient private var shScratch: Array[Double] = null
  @transient private var qScratch: Array[Long] = null

  override def createAggregationBuffer(): MoveoutBuffer =
    new MoveoutBuffer(
      Array.fill(candidates.length)(new StackBuffer(0L, null, null)),
      if (semblance) Array.fill(candidates.length)(SqAcc.empty()) else null)

  override def update(buf: MoveoutBuffer, input: InternalRow): MoveoutBuffer = {
    val bufs = buf.stacks
    val v = samples.eval(input)
    val off = offset.eval(input)
    if (v != null && off != null) {
      val a = v.asInstanceOf[ArrayData]
      val offD = off.asInstanceOf[Double]
      val n = a.numElements()
      if (trScratch == null || trScratch.length < n) {
        trScratch = new Array[Double](n)
        shScratch = new Array[Double](n)
        qScratch = new Array[Long](n)
      }
      val tr = trScratch
      var i = 0
      while (i < n) {
        tr(i) = TraceExprs.elemStrict(prettyName, a, i, isFloat); i += 1
      }
      val shifted = shScratch
      var c = 0
      while (c < cands.length) {
        val shift = cands(c) * offD // the `_cand * offset` double product
        i = 0
        while (i < n) {
          // ShiftResampleExpr.kernel's loop body, verbatim
          val pos = (i + 1).toDouble + shift
          val i0 = math.floor(pos).toInt
          val f = pos - i0.toDouble
          val v0 = if (i0 >= 1 && i0 <= n) tr(i0 - 1) else 0.0
          val v1 = if (i0 + 1 >= 1 && i0 + 1 <= n) tr(i0) else 0.0
          shifted(i) = v0 + (v1 - v0) * f
          i += 1
        }
        val mode = StackBuffer.addWithQ(bufs(c), shifted, n, qScratch)
        if (buf.sqs != null) {
          // Σx² squares the SAME exact values the stack summed this row:
          // the longs in long mode, the scale-10 numerators in fast10
          // mode, the quantized decimals once fully promoted
          val sq = buf.sqs(c)
          if (mode == 0) {
            i = 0
            while (i < n) { sq.addLong(shifted(i).toLong); i += 1 }
          } else if (mode == 1) {
            sq.ensureF20()
            i = 0
            while (i < n) { sq.addQ(qScratch(i)); i += 1 }
          } else {
            sq.promote()
            i = 0
            while (i < n) { sq.addDec(StackBuffer.decQ(shifted(i))); i += 1 }
          }
        }
        c += 1
      }
    }
    buf
  }

  override def merge(b: MoveoutBuffer, o: MoveoutBuffer): MoveoutBuffer = {
    var c = 0
    while (c < b.stacks.length) {
      // every SqAcc mode is self-describing (scale-0 / scale-20 /
      // decimal) and all conversions are exact, so the Σx² merge runs
      // its own matrix unconditionally — an empty side is a scale-0
      // zero, which every pairing absorbs exactly
      if (b.sqs != null) b.sqs(c).mergeFrom(o.sqs(c))
      StackBuffer.mergeInto(b.stacks(c), o.stacks(c))
      c += 1
    }
    b
  }

  /** num = Σ_t s_t² over the EXACT per-position sums, as a scale-20
    * decimal — long sums square through BigInteger (s_t² can exceed
    * 2⁶³), fast10 sums through their exact scale-10 decimals, decimal
    * sums through scale-10 × scale-10 products.
    */
  private def numerator(b: StackBuffer): JBigDecimal = {
    var num = JBigDecimal.ZERO
    if (b.decSums != null) {
      var i = 0
      while (i < b.decSums.length) {
        num = num.add(b.decSums(i).multiply(b.decSums(i))); i += 1
      }
    } else if (b.f10Hi != null) {
      var i = 0
      while (i < b.f10Hi.length) {
        val s = new JBigDecimal(SqAcc.toBigInt(b.f10Hi(i), b.f10Lo(i)), 10)
        num = num.add(s.multiply(s)); i += 1
      }
    } else if (b.longSums != null) {
      var acc = java.math.BigInteger.ZERO
      var i = 0
      while (i < b.longSums.length) {
        val s = java.math.BigInteger.valueOf(b.longSums(i))
        acc = acc.add(s.multiply(s)); i += 1
      }
      num = new JBigDecimal(acc).setScale(20)
    }
    num
  }

  override def eval(buf: MoveoutBuffer): Any = {
    val bufs = buf.stacks
    var bestIdx = -1
    var bestE = 0.0
    var bestStack: Array[Double] = null
    var c = 0
    while (c < bufs.length) {
      val mean = StackBuffer.meanArray(bufs(c))
      val e =
        if (buf.sqs == null) {
          // DotExpr's left fold of the mean with itself
          var acc = 0.0
          var i = 0
          while (i < mean.length) { acc += mean(i) * mean(i); i += 1 }
          acc
        } else {
          // semblance: exact num / (N · exact den), three correctly-
          // rounded float steps — the oracle's decimal→double casts
          val numD = java.lang.Double.parseDouble(
            numerator(bufs(c)).toPlainString)
          val denD = java.lang.Double.parseDouble(
            buf.sqs(c).toBigDecimal.toPlainString)
          numD / (bufs(c).n.toDouble * denD)
        }
      // ascending candidates, strict > — ties keep the smallest shift
      // (NaN never beats, so all-NaN keeps candidate 0)
      if (bestIdx < 0 || e > bestE) { bestIdx = c; bestE = e; bestStack = mean }
      c += 1
    }
    InternalRow(cands(bestIdx), bufs(bestIdx).n, bestE,
      UnsafeArrayData.fromPrimitiveArray(bestStack))
  }

  override def serialize(buf: MoveoutBuffer): Array[Byte] = {
    val len = math.max(0, buf.stacks(0).length)
    val bos = new ByteArrayOutputStream(
      8 + buf.stacks.length * (48 + 16 * len))
    val out = new DataOutputStream(bos)
    out.writeInt(buf.stacks.length)
    buf.stacks.foreach(StackBuffer.write(out, _))
    if (buf.sqs != null) buf.sqs.foreach(SqAcc.write(out, _))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MoveoutBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val k = in.readInt()
    new MoveoutBuffer(
      Array.fill(k)(StackBuffer.read(in)),
      if (semblance) Array.fill(k)(SqAcc.read(in)) else null)
  }

  override def withNewMutableAggBufferOffset(o: Int): MoveoutStackAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MoveoutStackAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MoveoutStackAgg =
    copy(samples = l, offset = r)
}

/** PER-POSITION exact Σx², mode-paired with a [[StackBuffer]] exactly
  * like [[SqAcc]] but with one accumulator per sample position — the
  * state behind the windowed-semblance denominator. Long mode holds two
  * long arrays (unsigned 128-bit per position); decimal mode one
  * scale-20 decimal per position.
  */
final class PosSqAcc(var hi: Array[Long], var lo: Array[Long],
                     var dec: Array[JBigDecimal]) extends Serializable {
  /** true → the 128-bit positions hold scale-20 numerators (FAST20);
    * false → scale-0 integers (long mode). Meaningless once `dec` set.
    */
  var sc20: Boolean = false

  def length: Int =
    if (dec != null) dec.length else if (hi != null) hi.length else -1

  def ensureLong(n: Int): Unit = if (hi == null && dec == null) {
    hi = new Array[Long](n); lo = new Array[Long](n)
  }
  def ensureDec(n: Int): Unit =
    if (dec == null) dec = Array.fill(n)(JBigDecimal.ZERO)

  /** Enter FAST20 mode: allocates fresh at length n, upscales a scale-0
    * era exactly when every position is ≤ 2⁶⁰ (then ·10²⁰ fits 128
    * bits), and otherwise promotes to decimal — addQ then feeds the
    * decimal arm exactly. No-op if already FAST20 or decimal.
    */
  def ensureF20(n: Int): Unit = if (dec == null && !sc20) {
    if (hi == null) {
      hi = new Array[Long](n); lo = new Array[Long](n); sc20 = true
    } else {
      var ok = true
      var i = 0
      while (ok && i < hi.length) {
        ok = hi(i) == 0L && lo(i) >= 0L && lo(i) <= SqAcc.MaxSc0ToF20
        i += 1
      }
      if (ok) {
        i = 0
        while (i < hi.length) {
          val h1 = Math.multiplyHigh(lo(i), StackBuffer.E10)
          val l1 = lo(i) * StackBuffer.E10
          hi(i) = h1 * StackBuffer.E10 + SqAcc.uMulHighE10(l1)
          lo(i) = l1 * StackBuffer.E10
          i += 1
        }
        sc20 = true
      } else promote()
    }
  }

  /** 128-bit += v² at position i (long mode). */
  def addLong(i: Int, v: Long): Unit = {
    val pHi = Math.multiplyHigh(v, v); val pLo = v * v
    val nLo = lo(i) + pLo
    if (java.lang.Long.compareUnsigned(nLo, lo(i)) < 0) hi(i) += 1
    lo(i) = nLo; hi(i) += pHi
  }

  /** += q² at position i where q is an exact scale-10 numerator (FAST20
    * mode, guard-promoting the whole accumulator to decimal near the
    * 128-bit ceiling; dispatches to the decimal arm after promotion).
    */
  def addQ(i: Int, q: Long): Unit =
    if (dec != null) dec(i) = dec(i).add(SqAcc.decSq(q))
    else {
      if (java.lang.Long.compareUnsigned(hi(i), SqAcc.F20GuardHi) >= 0) {
        promote()
        dec(i) = dec(i).add(SqAcc.decSq(q))
      } else addLong(i, q) // same 128-bit += q², scale carried by sc20
    }

  /** += q² at position i (decimal mode; q scale-10 quantized). */
  def addDec(i: Int, q: JBigDecimal): Unit = dec(i) = dec(i).add(q.multiply(q))

  def posDec(i: Int): JBigDecimal =
    if (dec != null) dec(i)
    else if (sc20) new JBigDecimal(SqAcc.toBigInt(hi(i), lo(i)), 20)
    else new JBigDecimal(SqAcc.toBigInt(hi(i), lo(i))).setScale(20)

  /** Exact per-position 128-bit → decimal promotion. */
  def promote(): Unit = if (dec == null && hi != null) {
    dec = Array.tabulate(hi.length)(posDec)
    hi = null; lo = null; sc20 = false
  }

  def mergeFrom(o: PosSqAcc): Unit = {
    if (o.length < 0) return
    if (length < 0) {
      hi = o.hi; lo = o.lo; dec = o.dec; sc20 = o.sc20
      return
    }
    if (dec == null && o.dec == null && sc20 != o.sc20) {
      // align scales: upscale the scale-0 side exactly (or promote it
      // to decimal if too big — the re-check below routes that)
      if (!sc20) ensureF20(hi.length) else o.ensureF20(o.hi.length)
    }
    // same composing-merges overflow guard as SqAcc.mergeFrom, per
    // position: any side at ≥ 2¹²⁶ routes the whole merge to decimal
    var fits = dec == null && o.dec == null
    if (fits) {
      var i = 0
      while (fits && i < hi.length) {
        fits =
          java.lang.Long.compareUnsigned(hi(i), SqAcc.MergeGuardHi) < 0 &&
          java.lang.Long.compareUnsigned(o.hi(i), SqAcc.MergeGuardHi) < 0
        i += 1
      }
    }
    if (fits) {
      var i = 0
      while (i < hi.length) {
        val nLo = lo(i) + o.lo(i)
        if (java.lang.Long.compareUnsigned(nLo, lo(i)) < 0) hi(i) += 1
        lo(i) = nLo; hi(i) += o.hi(i)
        i += 1
      }
    } else {
      promote(); o.promote()
      var i = 0
      while (i < dec.length) { dec(i) = dec(i).add(o.dec(i)); i += 1 }
    }
  }
}

object PosSqAcc {
  def empty(): PosSqAcc = new PosSqAcc(null, null, null)

  def write(out: DataOutputStream, p: PosSqAcc): Unit = {
    out.writeInt(p.length)
    if (p.length >= 0) {
      if (p.dec != null) {
        out.writeByte(1); p.dec.foreach(d => out.writeUTF(d.toPlainString))
      } else {
        out.writeByte(if (p.sc20) 2 else 0)
        SqAcc.writeLongs(out, p.hi); SqAcc.writeLongs(out, p.lo)
      }
    }
  }

  def read(in: DataInputStream): PosSqAcc = {
    val n = in.readInt()
    if (n < 0) empty()
    else in.readByte() match {
      case 1 =>
        new PosSqAcc(null, null,
          Array.fill(n)(new JBigDecimal(in.readUTF())))
      case tag =>
        val p = new PosSqAcc(SqAcc.readLongs(in, n), SqAcc.readLongs(in, n), null)
        p.sc20 = tag == 2
        p
    }
  }
}

/** Aggregation state of [[MoveoutPanelAgg]]: per candidate, the exact
  * stack sums plus the per-position exact Σx².
  */
final class PanelBuffer(val stacks: Array[StackBuffer],
                        val pos: Array[PosSqAcc]) extends Serializable

/** The VELOCITY-SPECTRUM PANEL — windowed semblance, the deliverable a
  * velocity picker actually reads: for every candidate moveout c and
  * every sample position t,
  *   S_c(t) = Σ_{τ∈W(t)} s_cτ² / (N · Σ_{τ∈W(t)} d_cτ)
  * with s_cτ the stacked (summed) trace, d_cτ = Σ_i a²_iτ the total
  * energy at position τ, and W(t) the clipped window [t−h, t+h] ∩ [1,n]
  * (the AGC edge convention, h = (window−1)/2). One aggregate computes
  * the full |candidates| × nSamples panel per cell.
  *
  * Exactness: s is the [[StackBuffer]] exact sum, d the [[PosSqAcc]]
  * exact per-position Σx² (128-bit integers in long mode, scale-20
  * decimals after promotion — mode-paired with the stack, same scale-10
  * HALF_UP value quantization). At eval the windowed numerator/
  * denominator are decimal PREFIX-SUM differences — exact, hence equal
  * to the oracle's direct windowed decimal sums — and only the two
  * final string→double casts and one divide are floating point, so
  * every panel value hash-matches at any trace length.
  *
  * Scale: the shuffle carries |candidates| × (nSamples stack sums +
  * nSamples Σx²) per cell per map partition — panel state is
  * Θ(candidates · nSamples) per cell, independent of trace count, and
  * the per-row update is the same read-once lerp loop as
  * [[MoveoutStackAgg]] plus one multiply-add per sample.
  *
  * Output: struct<n_traces, shifts: array<double>,
  * panels: array<array<double>>> — row r of `panels` is candidate
  * `shifts(r)`'s semblance trace.
  */
case class MoveoutPanelAgg(samples: Expression, offset: Expression,
                           candidates: IndexedSeq[Double], window: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PanelBuffer]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  require(candidates.nonEmpty, "panel needs at least one candidate")
  require(window >= 1 && window % 2 == 1,
    s"window must be odd and >= 1, got $window")

  override def left: Expression = samples
  override def right: Expression = offset
  override def nullable: Boolean = false
  override def prettyName: String = "trace_semblance_panel"

  override def dataType: DataType = StructType(Seq(
    StructField("n_traces", LongType, nullable = false),
    StructField("shifts", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("panels", ArrayType(
      ArrayType(DoubleType, containsNull = false), containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val samplesCheck = TraceExprs.checkSamplesType(prettyName, samples)
    if (samplesCheck.isFailure) samplesCheck
    else offset.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName offset must be double, got $t")
    }
  }

  @transient private lazy val isFloat = VecExprs.isFloatArray(samples)
  @transient private lazy val cands: Array[Double] = candidates.toArray
  @transient private var trScratch: Array[Double] = null
  @transient private var shScratch: Array[Double] = null
  @transient private var qScratch: Array[Long] = null

  override def createAggregationBuffer(): PanelBuffer =
    new PanelBuffer(
      Array.fill(candidates.length)(new StackBuffer(0L, null, null)),
      Array.fill(candidates.length)(PosSqAcc.empty()))

  override def update(buf: PanelBuffer, input: InternalRow): PanelBuffer = {
    val v = samples.eval(input)
    val off = offset.eval(input)
    if (v != null && off != null) {
      val a = v.asInstanceOf[ArrayData]
      val offD = off.asInstanceOf[Double]
      val n = a.numElements()
      if (trScratch == null || trScratch.length < n) {
        trScratch = new Array[Double](n)
        shScratch = new Array[Double](n)
        qScratch = new Array[Long](n)
      }
      val tr = trScratch
      var i = 0
      while (i < n) {
        tr(i) = TraceExprs.elemStrict(prettyName, a, i, isFloat); i += 1
      }
      val shifted = shScratch
      var c = 0
      while (c < cands.length) {
        val shift = cands(c) * offD
        i = 0
        while (i < n) {
          // ShiftResampleExpr.kernel's loop body, verbatim
          val pos = (i + 1).toDouble + shift
          val i0 = math.floor(pos).toInt
          val f = pos - i0.toDouble
          val v0 = if (i0 >= 1 && i0 <= n) tr(i0 - 1) else 0.0
          val v1 = if (i0 + 1 >= 1 && i0 + 1 <= n) tr(i0) else 0.0
          shifted(i) = v0 + (v1 - v0) * f
          i += 1
        }
        // Σx² squares the SAME exact values the stack summed this row:
        // longs / scale-10 numerators / quantized decimals by mode
        val mode = StackBuffer.addWithQ(buf.stacks(c), shifted, n, qScratch)
        val p = buf.pos(c)
        if (mode == 0) {
          p.ensureLong(n)
          i = 0
          while (i < n) { p.addLong(i, shifted(i).toLong); i += 1 }
        } else if (mode == 1) {
          p.ensureF20(n)
          i = 0
          while (i < n) { p.addQ(i, qScratch(i)); i += 1 }
        } else {
          p.promote()
          p.ensureDec(n)
          i = 0
          while (i < n) {
            p.addDec(i, StackBuffer.decQ(shifted(i)))
            i += 1
          }
        }
        c += 1
      }
    }
    buf
  }

  override def merge(b: PanelBuffer, o: PanelBuffer): PanelBuffer = {
    var c = 0
    while (c < b.stacks.length) {
      // PosSqAcc modes are self-describing and every conversion exact,
      // so the Σx² merge runs its own matrix (mergeFrom handles the
      // empty sides too) — no stack-predicate mirroring needed
      b.pos(c).mergeFrom(o.pos(c))
      StackBuffer.mergeInto(b.stacks(c), o.stacks(c))
      c += 1
    }
    b
  }

  override def eval(buf: PanelBuffer): Any = {
    val len = math.max(0, buf.stacks(0).length)
    val h = (window - 1) / 2
    val nT = buf.stacks(0).n
    val panels = new Array[Any](cands.length)
    var c = 0
    while (c < cands.length) {
      val b = buf.stacks(c)
      // exact prefix sums: pNum(t) = Σ_{τ≤t} s_τ², pDen(t) = Σ_{τ≤t} d_τ
      val pNum = new Array[JBigDecimal](len + 1)
      val pDen = new Array[JBigDecimal](len + 1)
      pNum(0) = JBigDecimal.ZERO; pDen(0) = JBigDecimal.ZERO
      var t = 0
      while (t < len) {
        val s =
          if (b.decSums != null) b.decSums(t)
          else if (b.f10Hi != null)
            new JBigDecimal(SqAcc.toBigInt(b.f10Hi(t), b.f10Lo(t)), 10)
          else JBigDecimal.valueOf(b.longSums(t))
        pNum(t + 1) = pNum(t).add(s.multiply(s))
        pDen(t + 1) = pDen(t).add(buf.pos(c).posDec(t))
        t += 1
      }
      val panel = new Array[Double](len)
      t = 0
      while (t < len) {
        val lo = math.max(0, t - h)          // window start, 0-based incl.
        val hi = math.min(len, t + h + 1)    // window end, 0-based excl.
        val numW = pNum(hi).subtract(pNum(lo))
        val denW = pDen(hi).subtract(pDen(lo))
        panel(t) = java.lang.Double.parseDouble(numW.toPlainString) /
          (nT.toDouble * java.lang.Double.parseDouble(denW.toPlainString))
        t += 1
      }
      panels(c) = UnsafeArrayData.fromPrimitiveArray(panel)
      c += 1
    }
    InternalRow(nT, UnsafeArrayData.fromPrimitiveArray(cands),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(panels))
  }

  override def serialize(buf: PanelBuffer): Array[Byte] = {
    // presized for the dominant fixed-point case (hi+lo per stack and
    // per pos entry): ~64 KB per candidate at 1000 samples — growing a
    // default-32-byte stream there doubles ~11 times per buffer
    val len = math.max(0, buf.stacks(0).length)
    val bos = new ByteArrayOutputStream(
      8 + buf.stacks.length * (32 + 32 * len))
    val out = new DataOutputStream(bos)
    out.writeInt(buf.stacks.length)
    buf.stacks.foreach(StackBuffer.write(out, _))
    buf.pos.foreach(PosSqAcc.write(out, _))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PanelBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val k = in.readInt()
    new PanelBuffer(
      Array.fill(k)(StackBuffer.read(in)),
      Array.fill(k)(PosSqAcc.read(in)))
  }

  override def withNewMutableAggBufferOffset(o: Int): MoveoutPanelAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MoveoutPanelAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MoveoutPanelAgg =
    copy(samples = l, offset = r)
}
