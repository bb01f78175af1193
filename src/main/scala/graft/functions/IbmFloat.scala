package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, FloatType}

/** IBM System/360 hexadecimal float32 → IEEE float, as a NATIVE Catalyst
  * expression with whole-stage codegen — the decode every real SEG-Y byte
  * reader needs (the reference delegates it to the `segy` PyPI package; the
  * format itself is public: sign bit, 7-bit excess-64 base-16 exponent,
  * 24-bit fraction).
  *
  * value = (−1)^sign × 0.fraction × 16^(exponent − 64)
  *
  * A UDF doing this would break codegen and box every row; this expression
  * inlines to a handful of integer ops + one multiply inside the generated
  * loop.
  */
object IbmFloatDecode {
  /** Scalar decode, shared by interpreted eval and tests. */
  def decode(bits: Int): Float = {
    if ((bits & 0x7fffffff) == 0) return 0.0f
    val sign = if ((bits & 0x80000000) != 0) -1.0 else 1.0
    val exponent = (bits >>> 24) & 0x7f
    val fraction = (bits & 0x00ffffff).toDouble / 0x1000000.toDouble // 16^6 scale
    (sign * fraction * math.pow(16.0, (exponent - 64).toDouble)).toFloat
  }

  def apply(c: Column): Column =
    ColumnBridge.column(IbmFloat32(ColumnBridge.expression(c)))

  /** For SparkSessionExtensions.injectFunction. */
  val functionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("ibm_float32"),
    new ExpressionInfo(classOf[IbmFloat32].getName, "ibm_float32"),
    (children: Seq[Expression]) => IbmFloat32(children.head))
}

final case class IbmFloat32(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = FloatType
  override def prettyName: String = "ibm_float32"

  override protected def nullSafeEval(input: Any): Any =
    IbmFloatDecode.decode(input.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bits => {
      s"""
         |int ibmBits = $bits;
         |if ((ibmBits & 0x7fffffff) == 0) {
         |  ${ev.value} = 0.0f;
         |} else {
         |  double ibmSign = ((ibmBits & 0x80000000) != 0) ? -1.0 : 1.0;
         |  int ibmExp = (ibmBits >>> 24) & 0x7f;
         |  double ibmFrac = (double)(ibmBits & 0x00ffffff) / 16777216.0;
         |  ${ev.value} = (float)(ibmSign * ibmFrac * java.lang.Math.pow(16.0, ibmExp - 64));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IbmFloat32 =
    copy(child = newChild)
}

/** IEEE-754 bit pattern → float32 (SEG-Y sample format 5; the trivial
  * sibling of [[IbmFloat32]] for rev-1+ files). Codegen inlines to the
  * JVM intrinsic.
  */
object IeeeFloat32Decode {
  def apply(c: Column): Column =
    ColumnBridge.column(IeeeFloat32(ColumnBridge.expression(c)))
}

final case class IeeeFloat32(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = FloatType
  override def prettyName: String = "ieee_float32"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Float.intBitsToFloat(input.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bits =>
      s"${ev.value} = java.lang.Float.intBitsToFloat($bits);")

  override protected def withNewChildInternal(newChild: Expression): IeeeFloat32 =
    copy(child = newChild)
}
