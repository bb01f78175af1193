package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TraceOps]]: AGC window clipping at trace edges, dead-window zeroing,
  * mute bounds — the per-sample arithmetic against hand-computed values.
  */
class TraceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(v: Seq[Double], f: org.apache.spark.sql.Column): Seq[Double] =
    Seq(Tuple1(v)).toDF("v").select(f.as("o"))
      .as[Seq[Double]].head()

  test("AGC divides each sample by its clipped-window RMS") {
    val v = Seq(3.0, 4.0, 0.0, -12.0)
    val got = run(v, TraceOps.agc(col("v"), 4, 3))
    val rms = Seq(
      math.sqrt((9.0 + 16.0) / 2),
      math.sqrt((9.0 + 16.0 + 0.0) / 3),
      math.sqrt((16.0 + 0.0 + 144.0) / 3),
      math.sqrt((0.0 + 144.0) / 2))
    got.zip(v.zip(rms)).foreach { case (g, (x, r)) => assert(g == x / r) }
  }

  test("a dead window outputs 0 instead of dividing") {
    assert(run(Seq(0.0, 0.0, 0.0), TraceOps.agc(col("v"), 3, 3)) ==
      Seq(0.0, 0.0, 0.0))
  }

  test("window 1 is pure sign normalization (|x|/x magnitude 1)") {
    assert(run(Seq(5.0, -2.0, 0.0), TraceOps.agc(col("v"), 3, 1)) ==
      Seq(1.0, -1.0, 0.0))
  }

  test("muteTop zeroes strictly before firstLive and passes the rest") {
    assert(run(Seq(1.0, 2.0, 3.0, 4.0), TraceOps.muteTop(col("v"), 4, 3)) ==
      Seq(0.0, 0.0, 3.0, 4.0))
    assert(run(Seq(1.0, 2.0), TraceOps.muteTop(col("v"), 2, 1)) ==
      Seq(1.0, 2.0)) // firstLive 1 = no-op
  }

  test("even windows and out-of-range mutes are rejected") {
    intercept[IllegalArgumentException](TraceOps.agc(col("v"), 4, 2))
    intercept[IllegalArgumentException](TraceOps.muteTop(col("v"), 4, 6))
  }

  test("stack averages traces element-wise per cell (exact decimal sums)") {
    val df = Seq(
      (1, Seq(1.0, 10.0)), (1, Seq(3.0, 30.0)),
      (2, Seq(5.0, 7.0))).toDF("cell", "v")
    val got = TraceOps.stack(df, Seq("cell"), "v", 2)
      .select("cell", "n_traces", "stack")
      .as[(Int, Long, Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1) == ((2L, Seq(2.0, 20.0))))
    assert(got(2) == ((1L, Seq(5.0, 7.0))))
  }

  test("shiftResample lerps at fractional positions and zeros beyond the trace") {
    val df = Seq((Seq(10.0, 20.0, 40.0), 0.5)).toDF("v", "sh")
    val got = df.select(TraceOps.shiftResample(col("v"), 3, col("sh")).as("o"))
      .as[Seq[Double]].head()
    assert(got == Seq(15.0, 30.0, 20.0)) // last window reads [40, 0]
    val whole = Seq((Seq(10.0, 20.0, 40.0), 1.0)).toDF("v", "sh")
      .select(TraceOps.shiftResample(col("v"), 3, col("sh")).as("o"))
      .as[Seq[Double]].head()
    assert(whole == Seq(20.0, 40.0, 0.0)) // integer shift = plain slide
    val none = Seq((Seq(10.0, 20.0, 40.0), 0.0)).toDF("v", "sh")
      .select(TraceOps.shiftResample(col("v"), 3, col("sh")).as("o"))
      .as[Seq[Double]].head()
    assert(none == Seq(10.0, 20.0, 40.0))
  }

  test("moveoutScan emitStack appends the WINNING candidate's stacked trace") {
    // two traces per cell, offsets 0 and 1; candidate 1.0 slides trace 2
    // left one sample, ALIGNING the pulses: stack [0,8,8,0] (energy 128)
    // beats candidate 0.0's misaligned [0,4,8,4] (energy 96)
    val df = Seq(
      (1, 0.0, Seq(0.0, 8.0, 8.0, 0.0)),
      (1, 1.0, Seq(0.0, 0.0, 8.0, 8.0))).toDF("cell", "off", "v")
    val got = TraceOps.moveoutScan(df, Seq("cell"), "v", 4,
      offsetCol = "off", candidates = Seq(0.0, 1.0), emitStack = true)
    assert(got.columns.toSeq ==
      Seq("cell", "best_shift", "n_traces", "energy", "stack"))
    val row = got.as[(Int, Double, Long, Double, Seq[Double])].head()
    assert(row._2 == 1.0 && row._3 == 2L)
    assert(row._5 == Seq(0.0, 8.0, 8.0, 0.0))
    // default keeps the pre-existing 4-column shape
    assert(TraceOps.moveoutScan(df, Seq("cell"), "v", 4,
      offsetCol = "off", candidates = Seq(0.0, 1.0)).columns.toSeq ==
      Seq("cell", "best_shift", "n_traces", "energy"))
  }

  test("wrong-typed samples fail at ANALYSIS time for every kernel") {
    import org.apache.spark.sql.AnalysisException
    val df = Seq((1, Seq(1, 2, 3))).toDF("k", "vi") // array<int>, not float
    def analyze(c: org.apache.spark.sql.Column): Unit =
      df.select(c).queryExecution.analyzed
    intercept[AnalysisException](analyze(TraceOps.agc(col("vi"), 3, 3)))
    intercept[AnalysisException](analyze(TraceOps.muteTop(col("vi"), 3, 2)))
    intercept[AnalysisException](analyze(
      TraceOps.firFilter(col("vi"), 3, Seq(1.0, 2.0, 1.0), 1)))
    intercept[AnalysisException](analyze(
      TraceOps.shiftResample(col("vi"), 3, lit(0.5))))
    intercept[AnalysisException] {
      df.groupBy("k").agg(graft.functions.TraceExprs.stack(col("vi")))
        .queryExecution.analyzed
    }
  }

  test("fused velocity plans stay fused: one exchange, no Generate/Window") {
    // the fusion CLAIM is a plan property — guard it so a future refactor
    // can't silently reintroduce the explode->window composition
    val df = Seq((1, 0.0, Seq(1.0, 2.0, 3.0)), (1, 1.0, Seq(2.0, 0.0, 1.0)))
      .toDF("cell", "off", "v")
    def planOf(r: org.apache.spark.sql.DataFrame): String = {
      r.collect() // force AQE to finalize
      r.queryExecution.executedPlan.toString
    }
    Seq(
      TraceOps.moveoutScan(df, Seq("cell"), "v", 3, "off", Seq(0.0, 0.5)),
      TraceOps.moveoutScan(df, Seq("cell"), "v", 3, "off", Seq(0.0, 0.5),
        coherence = "semblance"),
      TraceOps.semblancePanel(df, Seq("cell"), "v", 3, "off",
        Seq(0.0, 0.5), window = 3)
    ).foreach { r =>
      val plan = planOf(r)
      assert(!plan.contains("Window"), s"window operator crept in:\n$plan")
      assert(!plan.contains("Generate") || plan.contains("posexplode"),
        s"unexpected generator:\n$plan") // panel's posexplode over
                                         // |candidates| rows is the one
                                         // sanctioned generator
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 2, // the group-by shuffle (+AQE read) only
        s"extra shuffles:\n$plan")
      assert(plan.contains("ObjectHashAggregate"), s"not aggregated:\n$plan")
    }
  }

  test("by-cell pre-partitioning is reused by the aggregate: ONE exchange") {
    // the registered long-trace queries repartition by the group key so
    // each cell's Θ(cands·nSamples) state lives in exactly one task —
    // that only holds if the groupBy REUSES the hash partitioning
    // instead of planting a second shuffle; guard the plan property
    val df = Seq((1, 0.0, Seq(1.0, 2.0, 3.0)), (2, 1.0, Seq(2.0, 0.0, 1.0)),
        (1, 2.0, Seq(0.0, 1.0, 2.0)))
      .toDF("cell", "off", "v")
      .repartition(4, col("cell"))
    Seq(
      TraceOps.semblancePanel(df, Seq("cell"), "v", 3, "off",
        Seq(0.0, 0.5), window = 3),
      TraceOps.moveoutScan(df, Seq("cell"), "v", 3, "off", Seq(0.0, 0.5)),
      TraceOps.stack(df, Seq("cell"), "v", nSamples = 3)
    ).foreach { r =>
      r.collect() // force AQE to finalize
      // count live shuffle NODES on the finalized plan tree (string-
      // matching the printed plan relied on AQE rendering it exactly
      // twice — a Spark plan-printing change would break the test with
      // no product regression); descend through query stages so nested
      // exchanges still count
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      def liveShuffles(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => liveShuffles(a.executedPlan)
        case s: ShuffleQueryStageExec => 1 + s.plan.children.map(liveShuffles).sum
        // Spark 4.1 AQE wraps the final stage in a LEAF ResultQueryStageExec
        // whose subtree hangs off .plan — descend through every stage kind
        case q: QueryStageExec => liveShuffles(q.plan)
        case e: ShuffleExchangeExec => 1 + e.children.map(liveShuffles).sum
        case other => other.children.map(liveShuffles).sum
      }
      val shuffles = liveShuffles(r.queryExecution.executedPlan)
      assert(shuffles == 1,
        s"expected the explicit repartition to be the ONLY shuffle:\n" +
          s"${r.queryExecution.executedPlan}")
    }
  }

  test("FIR expressions with equal taps are structurally EQUAL (canonicalization)") {
    import graft.functions.FirFilterExpr
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val in = BoundReference(0, ArrayType(DoubleType), nullable = false)
    val a = FirFilterExpr(in, IndexedSeq(1.0, 4.0, 1.0), 1)
    val b = FirFilterExpr(in, IndexedSeq(1.0, 4.0, 1.0), 1)
    assert(a == b && a.hashCode == b.hashCode) // Array taps broke this
    assert(a.canonicalized == b.canonicalized)
    assert(a != FirFilterExpr(in, IndexedSeq(1.0, 5.0, 1.0), 1))
  }
}
