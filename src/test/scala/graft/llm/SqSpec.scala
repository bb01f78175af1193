package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class SqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: dim 8, 40 vectors; vec 39 clones vec 0;
  // dim 7 is constant (exercises the hi == lo → code 0 branch)
  private val dim = 8
  private def vec(i: Int): Seq[Float] =
    (0 until dim).map {
      case 7 => 0.25f
      case d => (((i * 131 + d * 57) % 251) / 251.0f)
    }
  private lazy val emb: DataFrame =
    ((0 until 39).map(i => (i.toLong, vec(i))) :+ (39L, vec(0)))
      .toDF("vec_id", "embedding")

  test("bounds are exact per-dim corpus min/max; constant dim collapses") {
    val (lo, hi) = Sq.bounds(emb)
    assert(lo.length == dim && hi.length == dim)
    (0 until dim - 1).foreach { d =>
      val xs = (0 until 40).map(i => vec(i)(d).toDouble)
      assert(lo(d) == xs.min && hi(d) == xs.max)
    }
    assert(lo(7) == hi(7))
  }

  test("encode emits one dim-long code row per vector, codes within [0, 255]") {
    val (lo, hi) = Sq.bounds(emb)
    val codes = Sq.encode(emb, lo, hi).collect()
    assert(codes.length == 40)
    codes.foreach { r =>
      val cs = r.getSeq[Long](r.fieldIndex("codes"))
      assert(cs.length == dim)
      assert(cs.forall(c => c >= 0 && c <= 255))
      assert(cs(7) == 0L, "constant dim must encode to 0")
    }
    // bounds endpoints land on the extreme codes
    val byId = codes.map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    (0 until dim - 1).foreach { d =>
      val xs = (0 until 40).map(i => vec(i)(d).toDouble)
      val loId = xs.indexOf(xs.min).toLong
      val hiId = xs.indexOf(xs.max).toLong
      assert(byId(loId)(d) == 0L)
      assert(byId(hiId)(d) == 255L)
    }
  }

  test("identical vectors get identical codes; clone is ADC rank 1") {
    val (lo, hi) = Sq.bounds(emb)
    val byId = Sq.encode(emb, lo, hi).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(byId(39L) == byId(0L))
    // the clone shares every code, so its ADC distance to query 0 is the
    // global minimum; ties (if any other vector hit the same codes at dim 8)
    // break on id, and 39 is the only clone by construction of vec()
    val top = Sq.adcTopK(emb, Seq(0L), k = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(top == Seq(39L))
  }

  test("persisted bounds round-trip exactly; append encodes with them") {
    val path = graft.core.TempDirs.scratch("sq_spec")
    Sq.buildIndex(emb, path)
    val (lo, hi) = Sq.bounds(emb)
    val (rlo, rhi) = Sq.readBounds(spark, path)
    assert(rlo.sameElements(lo) && rhi.sameElements(hi))
    // append two rows: an in-range vector encodes like batch encode; an
    // out-of-range vector clamps to the extreme codes instead of failing
    val extra = Seq((100L, vec(7)), (101L, Seq.fill(dim)(9.0f)))
      .toDF("vec_id", "embedding")
    Sq.appendToIndex(extra, path)
    val codes = spark.read.parquet(s"$path/codes").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(codes.size == 42)
    val batch = Sq.encode(emb, lo, hi).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(codes(100L) == batch(7L))
    assert(codes(101L).take(dim - 1).forall(_ == 255L))
    assert(codes(101L)(7) == 0L, "constant dim stays 0 even out of range")
  }

  test("exact rerank pins the clone at rank 1 via true cosine") {
    val got = Sq.adcTopK(emb, Seq(0L), k = 2, nRerank = 8)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(got(1L) == 39L)
  }

  test("encode plan is a narrow map: no exchange below the scan") {
    val (lo, hi) = Sq.bounds(emb)
    val plan = Sq.encode(emb, lo, hi).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"SQ encode must not shuffle:\n$plan")
  }
}
