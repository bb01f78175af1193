package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-trace sample processing — the classic post-ingest seismic
  * conditioning steps a user of the reference stack runs right after
  * `segy_to_mdio` (the reference itself stops at storage; these are the
  * first operations every workflow applies to the stored amplitude
  * arrays). All pure column expressions over the `array<double>` sample
  * column: embarrassingly parallel, no shuffle, and every arithmetic step
  * is IEEE-deterministic (left-to-right folds, correctly-rounded sqrt),
  * so the DuckDB oracle replays them bit-for-bit.
  */
object TraceOps {

  /** Automatic gain control: each sample is divided by the RMS of a
    * sliding window centered on it (window length `window`, odd; clipped
    * at trace edges) — the standard amplitude-balancing step that
    * equalizes weak deep reflections against strong shallow ones. Dead
    * windows (RMS 0) output 0 rather than dividing.
    *
    * `nSamples` is fixed per file (SEG-Y records are fixed-length), so
    * window bounds are plan-time literals and the whole transform is one
    * projection.
    */
  def agc(samples: Column, nSamples: Int, window: Int): Column = {
    require(window >= 1 && window % 2 == 1, s"AGC window must be odd, got $window")
    require(nSamples >= 1, s"nSamples must be >= 1, got $nSamples")
    val half = window / 2
    val out = (1 to nSamples).map { i => // 1-based sample position
      val lo = math.max(1, i - half)
      val hi = math.min(nSamples, i + half)
      val win = slice(samples, lo, hi - lo + 1)
      val sumSq = aggregate(win, lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
      val rms = sqrt(sumSq / lit((hi - lo + 1).toDouble))
      when(rms > 0.0, element_at(samples, i).cast("double") / rms)
        .otherwise(0.0)
    }
    array(out: _*)
  }

  /** Top mute: samples STRICTLY BEFORE 1-based position `firstLive` are
    * zeroed (the direct-arrival / water-column kill every marine workflow
    * applies before stacking); the rest pass through unchanged.
    */
  def muteTop(samples: Column, nSamples: Int, firstLive: Int): Column = {
    require(firstLive >= 1 && firstLive <= nSamples + 1,
      s"firstLive must be in 1..${nSamples + 1}, got $firstLive")
    val out = (1 to nSamples).map { i =>
      if (i < firstLive) lit(0.0)
      else element_at(samples, i).cast("double")
    }
    array(out: _*)
  }

  /** Fractional static shift — the statics/NMO primitive: the trace is
    * resampled at positions `i + shift` (1-based, `shift` in samples, may
    * be fractional and per-trace) by LINEAR interpolation; positions
    * outside the trace read 0 (the mute convention). The lerp
    * `v0 + (v1 - v0) * f` is evaluated with the identical operation order
    * in the oracle, so outputs are bit-deterministic.
    */
  def shiftResample(samples: Column, nSamples: Int, shift: Column): Column = {
    require(nSamples >= 1, s"nSamples must be >= 1, got $nSamples")
    val out = (1 to nSamples).map { i =>
      val pos = lit(i.toDouble) + shift.cast("double")
      val i0 = floor(pos).cast("int")
      val f = pos - i0.cast("double")
      def at(j: Column): Column =
        when(j.between(1, nSamples), element_at(samples, j).cast("double"))
          .otherwise(0.0)
      val v0 = at(i0)
      val v1 = at(i0 + 1)
      v0 + (v1 - v0) * f
    }
    array(out: _*)
  }

  /** Velocity-analysis miniature — the LINEAR MOVEOUT SCAN: for each
    * candidate moveout `s`, every trace shifts by `s × offset`
    * ([[shiftResample]]), the cell stacks ([[stack]]), and the candidate
    * whose stacked trace carries the most energy wins (coherent energy
    * grows when the moveout is right — the flatten-and-stack principle
    * behind every semblance scan). Emits one row per cell:
    * (`keys…`, best_shift, n_traces, energy).
    *
    * Determinism: stacks are DECIMAL-exact, energy is a fixed-order
    * product-sum of those exact means, and candidate ties resolve to the
    * smallest shift — the oracle replays the scan bit-for-bit.
    * Scale: candidates explode the trace table ×|candidates| (a plan-time
    * constant), then the one stack shuffle; the argmax window partitions
    * by cell (bounded by |candidates| rows per cell).
    */
  def moveoutScan(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
                  samplesCol: String, nSamples: Int, offsetCol: String,
                  candidates: Seq[Double]): org.apache.spark.sql.DataFrame = {
    require(candidates.nonEmpty, "moveoutScan needs at least one candidate")
    val cand = explode(array(candidates.map(lit): _*)).as("_cand")
    val shifted = df.select((keys.map(col) :+ col(samplesCol) :+
        col(offsetCol) :+ cand): _*)
      .withColumn("_shifted", shiftResample(col(samplesCol), nSamples,
        col("_cand") * col(offsetCol).cast("double")))
    val stacked = stack(shifted.withColumnRenamed("_shifted", "_sv"),
      keys :+ "_cand", "_sv", nSamples)
    val energy = (1 to nSamples).map(i =>
        element_at(col("stack"), i) * element_at(col("stack"), i))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_energy").desc, col("_cand"))
    stacked.withColumn("_energy", energy)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select((keys.map(col) :+ col("_cand").as("best_shift") :+
        col("n_traces") :+ col("_energy").as("energy")): _*)
  }

  /** CDP stack — THE seismic reduce: traces sharing a cell average
    * element-wise into one stacked trace. Per-position sums accumulate in
    * DECIMAL (the house exact-aggregation pattern), so the parallel stack
    * is order-independent and bit-identical to the serial oracle; one
    * double division per position at the end. Emits `keys`, `n_traces`,
    * and `stack` (array<double>, length `nSamples`).
    *
    * Scale: one shuffle on the cell keys; map-side partial decimal sums
    * combine, the shuffle carries nSamples decimals + a count per cell —
    * never the traces.
    */
  def stack(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
            samplesCol: String, nSamples: Int): org.apache.spark.sql.DataFrame = {
    require(keys.nonEmpty, "stack needs at least one cell key")
    require(nSamples >= 1, s"nSamples must be >= 1, got $nSamples")
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    val sums = (1 to nSamples).map(i =>
      sum(element_at(col(samplesCol), i).cast(dec)).as(s"_s$i"))
    val n = count(lit(1)).as("n_traces")
    df.groupBy(keys.map(col): _*)
      .agg(sums.head, (sums.tail :+ n): _*)
      .select((keys.map(col) :+ col("n_traces") :+
        array((1 to nSamples).map(i =>
          col(s"_s$i").cast("double") / col("n_traces").cast("double")): _*)
          .as("stack")): _*)
  }
}
