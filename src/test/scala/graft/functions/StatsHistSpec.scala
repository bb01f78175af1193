package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsHistSpec extends SparkSpec {
  import spark.implicits._

  private def flat(df: org.apache.spark.sql.DataFrame) =
    df.agg(StatsHistAgg.statsHist(col("x"), 5, 0.0, 10.0).as("s"))
      .select(col("s.n"), col("s.min_val"), col("s.max_val"),
        col("s.sum_val"), col("s.sumsq_val"), col("s.hist"))

  test("one-pass stats+hist equals the two-query composition") {
    // 32 partitions force real partial buffers + serialize/merge paths
    val df = (1 to 1000).map(i => (i % 11).toDouble).toDF("x").repartition(32)
    val r = flat(df).head()
    assert(r.getLong(0) == 1000L)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 10.0)
    val sum = (1 to 1000).map(_ % 11).sum.toDouble
    assert(r.getDouble(3) == sum)
    assert(r.getDouble(4) == (1 to 1000).map(i => (i % 11) * (i % 11)).sum.toDouble)
    // cross-check bins against the standalone histogram operator
    val hist = graft.operators.Stats.histogram(df, "x", nBins = 5, lo = 0.0, hi = 10.0)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    val bins = r.getSeq[Long](5)
    (0 until 5).foreach { b =>
      assert(bins(b) == hist.getOrElse(b.toLong, 0L), s"bin $b")
    }
  }

  test("out-of-range values clamp to edge bins; nulls are skipped") {
    val df = Seq(Some(-5.0), Some(99.0), Some(1.0), None).toDF("x")
    val r = flat(df).head()
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == -5.0 && r.getDouble(2) == 99.0)
    val bins = r.getSeq[Long](5)
    assert(bins(0) == 2L && bins(4) == 1L) // -5 and 1 clamp/fall low, 99 clamps high
  }

  test("random 2-decimal inputs match the composed two-pass operators exactly") {
    val rnd = new scala.util.Random(777L)
    val vals = (1 to 2000).map(_ => math.round(rnd.nextDouble() * 1200 - 100) / 100.0)
    val df = vals.toDF("x").repartition(16)
    val r = flat(df).head()
    // driver-side exact accumulation is the ground truth: parallel partial
    // buffers + merges must be order-independent and exact
    assert(r.getLong(0) == vals.length.toLong)
    assert(r.getDouble(1) == vals.min && r.getDouble(2) == vals.max)
    val exactSum = vals.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      .foldLeft(BigDecimal(0))(_ + _)
    assert(r.getDouble(3) == exactSum.toDouble)
    val hist = graft.operators.Stats.histogram(df, "x", nBins = 5, lo = 0.0, hi = 10.0)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    val bins = r.getSeq[Long](5)
    (0 until 5).foreach(b => assert(bins(b) == hist.getOrElse(b.toLong, 0L)))
  }

  test("empty input yields n=0 with null stats and zero bins") {
    val r = flat(Seq.empty[Double].toDF("x")).head()
    assert(r.getLong(0) == 0L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    assert(r.getSeq[Long](5).forall(_ == 0L))
  }
}
