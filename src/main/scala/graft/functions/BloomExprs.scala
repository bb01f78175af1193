package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd predicate.
  *
  * The filter bits ride the expression as a serialized blob (the same
  * reference-object pattern as the IVF centroid matrix in [[VecExprs]]):
  * Spark broadcasts each stage's task binary once per executor, and every
  * task deserializes the filter lazily, once. This is the expression-level
  * analog of a semi-join against a set too big to broadcast as a hash table
  * but cheap as bloom bits (~1.2 bytes/item at 1% fpp vs ~16 for a boxed
  * long set) — the standard "runtime filter" shape, made explicit so an
  * operator can place it exactly where the scan is.
  */
object BloomExprs {

  /** True iff `x` (LongType) might be in the serialized filter. */
  def mightContain(x: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(
      BloomMightContainExpr(ColumnBridge.expression(x),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bloomBytes)))

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }
}

/** `bloom_might_contain(x)` over a filter serialized into the plan; never
  * null-for-error — a corrupt blob throws at first use.
  */
final case class BloomMightContainExpr(child: Expression,
                                       bloomBytes: IndexedSeq[Byte])
  extends UnaryExpression with Serializable {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // blob as a Seq in the CASE-CLASS FIELD so equals/hashCode are structural
  // (an Array field compares by reference identity, defeating Catalyst
  // canonicalization/subexpression elimination — the FirFilterExpr lesson);
  // deserialization below happens once per task anyway
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes.toArray))

  def kernel(x: Long): Boolean = bloom.mightContainLong(x)

  override protected def nullSafeEval(x: Any): Any =
    kernel(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomself", this,
      classOf[BloomMightContainExpr].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.kernel($x);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)
}
