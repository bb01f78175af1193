package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded buffer: up to 2k candidate (value, id) pairs, compacted back to
  * the true top k whenever it fills — amortized O(log k) per row, O(k)
  * memory regardless of group size.
  */
final class TopKBuffer(val k: Int, var vs: Array[Double], var ids: Array[Long],
                       var size: Int) extends Serializable {
  def compact(keep: Int): Unit = {
    val idx = (0 until size).sortBy(i => (-vs(i), ids(i))).take(keep)
    val nvs = new Array[Double](vs.length)
    val nids = new Array[Long](ids.length)
    var j = 0
    idx.foreach { i => nvs(j) = vs(i); nids(j) = ids(i); j += 1 }
    vs = nvs; ids = nids; size = j
  }
}

/** Per-group top-k as a [[TypedImperativeAggregate]] — the SCALE-correct
  * alternative to `row_number().over(Window.partitionBy(g).orderBy(v))
  * .where(rank <= k)`: the window shape sorts EVERY row of every group
  * after a full shuffle; this aggregate keeps a k-bounded buffer per
  * group, combines map-side (partial aggregation — each task ships at
  * most k pairs per group it saw, not its rows), and the final merge is
  * O(k log k) per group. At 100 TB the difference is shuffling top-k
  * candidates vs shuffling the corpus.
  *
  * Ranking is (value DESC, id ASC) — ties are totally ordered, so the
  * result multiset is input-order independent. NaN values are IGNORED
  * (treated like null): Scala's total Double ordering ranks NaN worst
  * while SQL `ORDER BY value DESC` (Spark and DuckDB) ranks it best, so
  * admitting NaN would silently diverge from the window/oracle
  * formulation — dropping it keeps both sides agreeing on real values.
  * Output: array of `struct(v, id)` in rank order (posexplode downstream
  * for rows).
  */
case class TopKAgg(value: Expression, id: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0 && k <= 65536, s"k must be in [1, 65536], got $k")

  override def left: Expression = value
  override def right: Expression = id
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, new Array[Double](2 * k), new Array[Long](2 * k), 0)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      val dv = v.asInstanceOf[Number].doubleValue()
      if (!dv.isNaN) { // NaN policy: ignored, see class doc
        if (b.size == b.vs.length) b.compact(b.k)
        b.vs(b.size) = dv
        b.ids(b.size) = i.asInstanceOf[Number].longValue()
        b.size += 1
      }
    }
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.size) {
      if (b.size == b.vs.length) b.compact(b.k)
      b.vs(b.size) = o.vs(i); b.ids(b.size) = o.ids(i); b.size += 1
      i += 1
    }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    b.compact(b.k)
    new GenericArrayData((0 until b.size).map(i =>
      InternalRow(b.vs(i), b.ids(i))).toArray[Any])
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    b.compact(b.k) // ship at most k pairs
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) { out.writeDouble(b.vs(i)); out.writeLong(b.ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.vs(i) = in.readDouble(); b.ids(i) = in.readLong(); i += 1 }
    b.size = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKAgg =
    copy(value = l, id = r)
}

object TopKAgg {
  /** `df.groupBy(g).agg(TopKAgg.topK(col("v"), col("id"), 3))`. */
  def topK(value: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKAgg(ColumnBridge.expression(value),
      ColumnBridge.expression(id), k).toAggregateExpression())
}
