package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable buffer for [[StatsHistAgg]]: running masked count/min/max, exact
  * decimal sum and sum-of-squares, and fixed-edge histogram counts — the
  * whole SURVEY §2.10 stats surface in ONE aggregation state.
  */
final class StatsHistBuffer(var n: Long, var minV: Double, var maxV: Double,
                            var sum: JBigDecimal, var sumsq: JBigDecimal,
                            val bins: Array[Long]) extends Serializable

/** Single-pass summary stats + histogram as a [[TypedImperativeAggregate]]
  * (SURVEY §2.10's custom aggregate): one buffer accumulates count, min,
  * max, exact DECIMAL(…,2) sum and sum², and `nBins` equal-width histogram
  * counts over [lo, hi) (outside values clamp to the edge bins) — replacing
  * the two-query stats + histogram composition with one scan and one
  * shuffle of a single small buffer per partition.
  *
  * Determinism: sums accumulate in BigDecimal at scale 2 via the same
  * double→decimal path Spark's cast uses (shortest-string, HALF_UP), so the
  * result is order-independent and bit-identical to the DuckDB oracle's
  * DECIMAL accumulation; the final decimal→double conversions go through
  * string parsing (correctly rounded everywhere). Bucket indices use
  * exactly `floor((x − lo) / (hi − lo) · nBins)` in IEEE doubles — the
  * oracle SQL spells the identical expression.
  *
  * Null values are skipped (count semantics); zeros COUNT here — this is
  * the query-side operator, not the ingest non-zero mask.
  */
case class StatsHistAgg(child: Expression, nBins: Int, lo: Double, hi: Double,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StatsHistBuffer] with UnaryLike[Expression] {

  require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("min_val", DoubleType),
    StructField("max_val", DoubleType),
    StructField("sum_val", DoubleType),
    StructField("sumsq_val", DoubleType),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): StatsHistBuffer =
    new StatsHistBuffer(0L, Double.PositiveInfinity, Double.NegativeInfinity,
      JBigDecimal.ZERO, JBigDecimal.ZERO, new Array[Long](nBins))

  override def update(b: StatsHistBuffer, input: InternalRow): StatsHistBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].doubleValue()
      b.n += 1
      if (x < b.minV) b.minV = x
      if (x > b.maxV) b.maxV = x
      // same double→decimal path as Spark's cast: shortest string, then
      // scale-2 HALF_UP — exact for the fixture's 2-decimal values
      val xd = JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)
      b.sum = b.sum.add(xd)
      b.sumsq = b.sumsq.add(xd.multiply(xd))
      val raw = math.floor((x - lo) / (hi - lo) * nBins)
      val bin = math.min(math.max(raw, 0.0), (nBins - 1).toDouble).toInt
      b.bins(bin) += 1
    }
    b
  }

  override def merge(b: StatsHistBuffer, o: StatsHistBuffer): StatsHistBuffer = {
    b.n += o.n
    if (o.minV < b.minV) b.minV = o.minV
    if (o.maxV > b.maxV) b.maxV = o.maxV
    b.sum = b.sum.add(o.sum)
    b.sumsq = b.sumsq.add(o.sumsq)
    var i = 0
    while (i < nBins) { b.bins(i) += o.bins(i); i += 1 }
    b
  }

  override def eval(b: StatsHistBuffer): Any = {
    def parse(d: JBigDecimal): Double = java.lang.Double.parseDouble(d.toPlainString)
    InternalRow(b.n,
      if (b.n == 0) null else b.minV,
      if (b.n == 0) null else b.maxV,
      if (b.n == 0) null else parse(b.sum),
      if (b.n == 0) null else parse(b.sumsq),
      new GenericArrayData(b.bins.clone()))
  }

  override def serialize(b: StatsHistBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n); out.writeDouble(b.minV); out.writeDouble(b.maxV)
    out.writeUTF(b.sum.toPlainString); out.writeUTF(b.sumsq.toPlainString)
    out.writeInt(b.bins.length)
    b.bins.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): StatsHistBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong(); val mn = in.readDouble(); val mx = in.readDouble()
    val sum = new JBigDecimal(in.readUTF()); val sumsq = new JBigDecimal(in.readUTF())
    val bins = Array.fill(in.readInt())(in.readLong())
    new StatsHistBuffer(n, mn, mx, sum, sumsq, bins)
  }

  override def withNewMutableAggBufferOffset(o: Int): StatsHistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StatsHistAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): StatsHistAgg =
    copy(child = newChild)
}

object StatsHistAgg {
  /** Column wrapper: `df.agg(StatsHistAgg.statsHist(col("x"), 10, 0, 50))`. */
  def statsHist(c: Column, nBins: Int, lo: Double, hi: Double): Column =
    ColumnBridge.column(
      StatsHistAgg(ColumnBridge.expression(c), nBins, lo, hi).toAggregateExpression())
}
