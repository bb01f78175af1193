package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** exactQuantiles must equal the sorted-collect answer on every shape —
  * including the ones that break histogram routing if the recursion ever
  * disagrees with the bucket arithmetic: heavy ties, two-value columns,
  * constants, negatives, and a refineLimit small enough to force the
  * histogram + refine path on every corpus.
  */
class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99, 1.0)

  private def reference(values: Seq[Double], q: Double): Double = {
    val sorted = values.sorted
    sorted((math.ceil(q * sorted.size) - 1).toInt max 0)
  }

  private def check(values: Seq[Double], nBuckets: Int, refineLimit: Long): Unit = {
    val df = values.toDF("v")
    val row = Stats.exactQuantiles(df, "v", qs, nBuckets, refineLimit)
      .collect().head
    assert(row.getLong(0) == values.size.toLong)
    qs.zipWithIndex.foreach { case (q, i) =>
      val got = row.getDouble(i + 1)
      val want = reference(values, q)
      assert(got == want, s"q=$q: got $got want $want (n=${values.size})")
    }
  }

  test("fuzz: random doubles, forced refine path, 6 seeds") {
    (0 until 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vals = Seq.fill(3000)(rnd.nextDouble() * 2000 - 1000)
      check(vals, nBuckets = 8, refineLimit = 50)
    }
  }

  test("heavy ties: 50 distinct values over 5000 rows (the l_quantity shape)") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(5000)((1 + rnd.nextInt(50)).toDouble)
    check(vals, nBuckets = 8, refineLimit = 100)
    check(vals, nBuckets = 4096, refineLimit = 1 << 20) // direct top-r path
  }

  test("degenerate shapes: two-value, constant, negative, single row") {
    check(Seq.fill(2000)(7.5) ++ Seq.fill(1000)(-3.25), 8, 50)
    check(Seq.fill(1500)(0.125), 8, 50) // constant: min == max short-circuit
    check(Seq(-5.0), 8, 50)
    check(Seq(3.0, 1.0, 2.0), 8, 50)
  }

  test("bigint beyond 2^53: distinct longs that collide in double still " +
      "resolve to exact native values") {
    // Long.MaxValue-2 .. Long.MaxValue all round to the SAME double
    // (9.223372036854776e18), so the whole column is constant-in-double:
    // the double-range bound carries no information and the values must
    // come from the slice natively (the old min==max short-circuit
    // returned the rounded bound — one wrong long for every quantile)
    val base = Long.MaxValue
    val vals = Seq.fill(1000)(base - 2) ++ Seq.fill(1000)(base - 1) ++
      Seq.fill(1000)(base)
    assert(vals.map(_.toDouble).distinct.size == 1, "premise: double-colliding")
    val df = vals.toDF("v")
    // refineLimit below n forces the histogram path, whose zero bucket
    // width routes to the distinct-value (sub-ulp) branch
    val row = Stats.exactQuantiles(df, "v", Seq(0.25, 0.5, 1.0),
      nBuckets = 8, refineLimit = 50).collect().head
    assert(row.getLong(0) == 3000L)
    assert(row.getLong(1) == base - 2, s"p25 got ${row.getLong(1)}")
    assert(row.getLong(2) == base - 1, s"p50 got ${row.getLong(2)}")
    assert(row.getLong(3) == base, s"p100 got ${row.getLong(3)}")
    // the top-r arm (cnt <= refineLimit) must agree on the same shape
    val row2 = Stats.exactQuantiles(df, "v", Seq(0.25, 0.5, 1.0),
      nBuckets = 8, refineLimit = 1 << 20).collect().head
    assert((1 to 3).forall(i => row2.getLong(i) == row.getLong(i)),
      "top-r and distinct-value arms must agree")
  }

  test("nulls are excluded; empty input fails loudly") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0), None)
      .toDF("v")
    val row = Stats.exactQuantiles(df, "v", Seq(0.5)).collect().head
    assert(row.getLong(0) == 2L && row.getDouble(1) == 1.0)
    val e = intercept[IllegalArgumentException] {
      Stats.exactQuantiles(Seq.empty[Double].toDF("v"), "v", Seq(0.5))
    }
    assert(e.getMessage.contains("no non-null rows"))
  }
}
