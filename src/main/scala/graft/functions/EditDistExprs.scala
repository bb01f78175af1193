package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Segment keys for the EXACT edit-distance similarity join
  * ([[graft.llm.EditDistance]]) — the PassJoin blocking scheme
  * (Li/Deng/Feng, PVLDB 2011): a string of length l splits into k+1
  * contiguous segments; if ed(s, t) ≤ k then at least one of s's segments
  * (pigeonhole — k edits touch ≤ k segments) appears in t VERBATIM, at a
  * position shifted by at most k (each preceding edit shifts it by ≤ 1).
  * Candidates are therefore an equi-join of
  *
  *   index keys: (l = own length, segment ordinal, segment hash)
  *   probe keys: for each partner length l in [max(k+1, n−k), n] and each
  *               segment of the l-layout, every own-substring of that
  *               segment's length within ±k of its position
  *
  * and the join is COMPLETE (never drops a true pair) while emitting only
  * O(k³) keys per string. Keys carry a 64-bit XXH64 of the segment bytes,
  * not the segment text — a collision only ADDS a candidate (discarded by
  * the exact `levenshtein` verify), so hashing preserves exactness while
  * keeping the shuffle rows at 20 bytes. Probing only partner lengths
  * ≤ own length halves the key volume: the longer side of every pair does
  * the probing, equal lengths probe both ways, and the pair dedup upstream
  * of the verify absorbs the overlap.
  *
  * Segment layout for length l with S = k+1 segments: q = ⌊l/S⌋, r = l mod
  * S; segment i has length q (+1 for the last r segments) and starts at
  * i·q + max(0, i − (S − r)). Strings shorter than S chars have no
  * non-empty segmentation — the operator pairs those few near-empty docs
  * directly against their ≤ 2k-char length band instead.
  */
object EditDistExprs {

  val keySchema: StructType = StructType(Seq(
    StructField("l", IntegerType, nullable = false),
    StructField("seg", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))

  /** Own-length segment keys (empty array when the string is shorter than
    * k+1 chars).
    */
  def indexKeys(text: Column, k: Int): Column =
    ColumnBridge.column(PassJoinKeysExpr(ColumnBridge.expression(text), k, probe = false))

  /** Distinct probe keys towards all partner lengths in [max(k+1, n−k), n]
    * (empty array when the string is shorter than k+1 chars).
    */
  def probeKeys(text: Column, k: Int): Column =
    ColumnBridge.column(PassJoinKeysExpr(ColumnBridge.expression(text), k, probe = true))
}

final case class PassJoinKeysExpr(child: Expression, k: Int, probe: Boolean)
    extends UnaryExpression with Serializable {
  require(k >= 1 && k <= 16, s"edit-distance threshold must be in [1, 16], got $k")

  private val nSeg = k + 1

  override def dataType: DataType =
    ArrayType(EditDistExprs.keySchema, containsNull = false)
  override def prettyName: String =
    if (probe) "editdist_probe_keys" else "editdist_index_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs string, got $t")
  }

  def kernel(t: UTF8String): ArrayData = {
    val bytes = t.getBytes
    // codepoint → byte offset table (segment boundaries are codepoint
    // positions, matching levenshtein's codepoint-level unit costs)
    var n = 0
    var bi = 0
    while (bi < bytes.length) {
      bi += UTF8String.numBytesForFirstByte(bytes(bi)); n += 1
    }
    if (n < nSeg) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](n + 1)
    bi = 0
    var ci = 0
    while (bi < bytes.length) {
      off(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi)); ci += 1
    }
    off(n) = bytes.length

    def hashCp(from: Int, until: Int): Long =
      XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + off(from), off(until) - off(from), 42L)

    if (!probe) {
      val q = n / nSeg
      val r = n % nSeg
      val out = new Array[Any](nSeg)
      var i = 0
      while (i < nSeg) {
        val li = q + (if (i >= nSeg - r) 1 else 0)
        val pi = i * q + math.max(0, i - (nSeg - r))
        out(i) = new GenericInternalRow(Array[Any](n, i, hashCp(pi, pi + li)))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new mutable.HashSet[(Long, Long)]
      val buf = new mutable.ArrayBuffer[Any]
      var l = math.max(nSeg, n - k)
      while (l <= n) {
        val q = l / nSeg
        val r = l % nSeg
        var i = 0
        while (i < nSeg) {
          val li = q + (if (i >= nSeg - r) 1 else 0)
          val pi = i * q + math.max(0, i - (nSeg - r))
          var p = math.max(0, pi - k)
          val pHi = math.min(n - li, pi + k)
          while (p <= pHi) {
            val h = hashCp(p, p + li)
            if (seen.add(((l.toLong << 32) | i.toLong, h))) {
              buf += new GenericInternalRow(Array[Any](l, i, h))
            }
            p += 1
          }
          i += 1
        }
        l += 1
      }
      new GenericArrayData(buf.toArray)
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("passjoinself", this, classOf[PassJoinKeysExpr].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.kernel($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): PassJoinKeysExpr =
    copy(child = newChild)
}
