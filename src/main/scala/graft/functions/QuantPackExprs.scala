package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Transform coding for fixed-accuracy lossy trace storage — the piece
  * that closes the tight-tolerance gap between plain
  * `quantize(x).cast(float)`-then-zstd and ZFP-style coded storage
  * (reference `optimize/common.py:31-53` compresses lossy fast copies
  * with fixed-accuracy ZFP).
  *
  * Why the plain path decays at tight tolerance: the reconstructed floats
  * `k·2tol` have dense, grid-structured mantissas that a byte-level
  * compressor cannot see through — at q = 0.001 the study measured
  * ~12.3 bits/sample for a signal whose quantized information content is
  * ~8. The coded path stores what the quantizer actually knows — the
  * integer INDEX k = round(x/2tol) — transformed the way every
  * quantized-array codec does (numcodecs' quantize→delta→shuffle chain,
  * ZFP's decorrelate-then-bitplane idea):
  *
  *  1. **Fixed polynomial predictor, order 0–3, chosen PER TRACE by L1
  *     residual** (the FLAC fixed-predictor scheme): order 0 stores k
  *     directly (right when quantization noise dominates — differencing
  *     only doubles noise entropy), order 1 stores first differences
  *     (slowly varying amplitudes), orders 2–3 store higher differences
  *     (band-limited oscillatory traces, where each difference order
  *     multiplies the amplitude by ~2·sin(ω/2) < 1). One byte in the
  *     header records the choice; the decoder re-integrates.
  *  2. **Zigzag** to non-negative (sign bit → bit 0), so small ±residuals
  *     have zero high bytes.
  *  3. **Byte-plane transpose** (the "shuffle" filter): all low bytes,
  *     then the next plane, … — planes 2–3 become runs of zeros and the
  *     columnar compressor (zstd) removes them at ~0 cost, while plane 0
  *     entropy-codes to the quantized signal's real bit rate.
  *
  * The payload is a plain `binary` column; Parquet+zstd does the entropy
  * coding. Decode is BIT-EXACT equal to `quantize(x).cast(float)`: the
  * encoder derives k with the identical HALF_UP rounding Spark's `round`
  * uses, and the decoder replays the identical `k·2tol` double multiply
  * and float cast (asserted in QuantPackSpec and CompressionStudy).
  *
  * Layout per value: `[int32 n][byte order][n zigzag residuals as 4 byte
  * planes, little-endian within a plane]` — fixed-width so the kernel is
  * one branch-free pass each way; variable-width coding is delegated to
  * zstd, which sees longer runs than any varint would produce.
  */
object QuantPackExprs {

  def pack(samples: Column, tolerance: Double): Column =
    ColumnBridge.column(QuantPackExpr(ColumnBridge.expression(samples), tolerance))

  def unpack(bin: Column, tolerance: Double): Column =
    ColumnBridge.column(QuantUnpackExpr(ColumnBridge.expression(bin), tolerance))

  /** Spark's Round(double, 0) semantics exactly: HALF_UP via BigDecimal.
    * Any other rounding (rint's half-even, floor(x+0.5)) would diverge
    * from the documented `quantize` column on .5 grid points. Callers must
    * bound |a| first — longValueExact (not longValue, which silently
    * truncates ≥ 2⁶³ quotients to garbage that can pass downstream range
    * guards) makes an unbounded call fail loudly.
    */
  private[functions] def roundHalfUp(a: Double): Long =
    JBigDecimal.valueOf(a).setScale(0, RoundingMode.HALF_UP).longValueExact
}

/** See [[QuantPackExprs]]. Null samples are rejected loudly (same policy
  * as the conditioning kernels: a null inside a stored trace is
  * corruption, not data).
  */
final case class QuantPackExpr(child: Expression, tolerance: Double)
    extends UnaryExpression with Serializable {
  require(tolerance > 0, s"tolerance must be positive, got $tolerance")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "quant_pack"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TraceExprs.checkSamplesType(prettyName, child)

  @transient private lazy val isFloat = VecExprs.isFloatArray(child)

  def kernel(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val step = 2 * tolerance
    val k = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = TraceExprs.elemStrict(prettyName, a, i, isFloat)
      // an integer index cannot represent NaN/Inf — refuse loudly rather
      // than letting BigDecimal throw something cryptic (the plain
      // quantize() COLUMN propagates NaN; a storage codec must not
      // silently diverge, so non-finite samples are a caller error here)
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
        throw new IllegalArgumentException(
          s"$prettyName: non-finite sample $x at position ${i + 1} — mask " +
            "dead/overflowed traces before packing")
      val q = x / step
      // Pre-round magnitude gate: a quotient beyond the index range must
      // refuse HERE, before BigDecimal — x/step can reach ±2⁶³ (where
      // longValue would silently truncate to a small garbage index that
      // PASSES the post-round check) or ±Infinity (finite x over a
      // subnormal step), and both compare > the bound below.
      if (math.abs(q) > (1L << 27) + 0.5) throw new IllegalArgumentException(
        s"$prettyName: index ${"%.6g".format(q)} at position ${i + 1} exceeds 28 bits " +
          s"(value $x at tolerance $tolerance) — widen the tolerance")
      val ki = QuantPackExprs.roundHalfUp(q)
      // ±2²⁷ so even an order-3 residual (alternating-sign indices sum
      // to ≤ 8·|k|max) fits the 32-bit zigzag below
      if (ki < -(1L << 27) || ki > (1L << 27)) throw new IllegalArgumentException(
        s"$prettyName: index $ki at position ${i + 1} exceeds 28 bits " +
          s"(value $x at tolerance $tolerance) — widen the tolerance")
      k(i) = ki
      i += 1
    }
    // FLAC-style fixed-predictor selection: difference up to order 3,
    // keep the order whose residuals have the least L1 mass (the cheap,
    // monotone proxy for coded entropy). Differencing is done in place
    // on a copy per order; n is a trace length, this is 4 linear passes.
    var best = k.clone()
    var bestOrder = 0
    var bestL1 = { var s = 0L; var j = 0; while (j < n) { s += math.abs(k(j)); j += 1 }; s }
    val cur = k.clone()
    var order = 1
    while (order <= 3) {
      // in-place first difference of `cur` (prev value 0 before the trace)
      var prev = 0L
      var j = 0
      while (j < n) { val t = cur(j); cur(j) = t - prev; prev = t; j += 1 }
      var s = 0L
      j = 0
      while (j < n) { s += math.abs(cur(j)); j += 1 }
      if (s < bestL1) { bestL1 = s; best = cur.clone(); bestOrder = order }
      order += 1
    }
    val out = new Array[Byte](5 + 4 * n)
    out(0) = (n >>> 24).toByte; out(1) = ((n >>> 16) & 0xff).toByte
    out(2) = ((n >>> 8) & 0xff).toByte; out(3) = (n & 0xff).toByte
    out(4) = bestOrder.toByte
    i = 0
    while (i < n) {
      val d = best(i)
      // zigzag to non-negative so near-zero residuals zero the high planes
      val z = ((d << 1) ^ (d >> 63)).toInt
      out(5 + i) = (z & 0xff).toByte                 // plane 0
      out(5 + n + i) = ((z >>> 8) & 0xff).toByte     // plane 1
      out(5 + 2 * n + i) = ((z >>> 16) & 0xff).toByte
      out(5 + 3 * n + i) = ((z >>> 24) & 0xff).toByte
      i += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("packself", this, classOf[QuantPackExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
  }

  override protected def withNewChildInternal(c: Expression): QuantPackExpr =
    copy(child = c)
}

/** Inverse of [[QuantPackExpr]]: binary → `array<float>`, bit-identical
  * to `quantize(x).cast(float)` of the encoded samples.
  */
final case class QuantUnpackExpr(child: Expression, tolerance: Double)
    extends UnaryExpression with Serializable {
  require(tolerance > 0, s"tolerance must be positive, got $tolerance")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "quant_unpack"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs binary, got $t")
    }

  def kernel(b: Array[Byte]): ArrayData = {
    require(b.length >= 5, s"$prettyName: truncated payload (${b.length} bytes)")
    val n = ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
      ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    // long arithmetic: with n near 2³⁰ (a corrupt/hostile header on this
    // SQL-exposed function), `5 + 4 * n` wraps in Int and a 5-byte payload
    // would "validate" then attempt a multi-GiB allocation below
    require(b.length.toLong == 5L + 4L * n.toLong,
      s"$prettyName: payload length ${b.length} != ${5L + 4L * n.toLong} for n=$n")
    val order = b(4) & 0xff
    require(order <= 3, s"$prettyName: unknown predictor order $order")
    val step = 2 * tolerance
    val k = new Array[Long](n)
    var i = 0
    while (i < n) {
      val z = (b(5 + i) & 0xff) | ((b(5 + n + i) & 0xff) << 8) |
        ((b(5 + 2 * n + i) & 0xff) << 16) | ((b(5 + 3 * n + i) & 0xff) << 24)
      k(i) = (z >>> 1).toLong ^ -(z & 1).toLong
      i += 1
    }
    // undo the predictor: `order` running prefix-sum passes (each is the
    // exact inverse of one in-place first difference with prev = 0)
    var pass = 0
    while (pass < order) {
      var prev = 0L
      var j = 0
      while (j < n) { k(j) += prev; prev = k(j); j += 1 }
      pass += 1
    }
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      // the documented quantize column's exact arithmetic: double k,
      // double multiply, float cast
      out(i) = (k(i).toDouble * step).toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unpackself", this, classOf[QuantUnpackExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.kernel($a);")
  }

  override protected def withNewChildInternal(c: Expression): QuantUnpackExpr =
    copy(child = c)
}
