package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential fuzzing for the event-join family (as-of backward/forward/
  * tolerance, point-in-interval range join): each seeded random case runs
  * through the DISTRIBUTED operator and through an independent brute-force
  * O(n²) reference — a genuinely different algorithm agreeing on the same
  * semantics. Generation is aimed at exactly the places hand fixtures
  * under-cover: duplicate timestamps (left·right and left·left), equal-ts
  * inclusivity, sub-second boundaries (±1µs around whole seconds), empty
  * groups (keys on one side only), all-late/all-early extremes, zero-length
  * and bucket-straddling intervals. 130 seeded cases total.
  */
class JoinFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  // ---- generators ---------------------------------------------------

  // micro-precision timestamps clustered on whole seconds with adversarial
  // offsets: exact boundary, ±1µs, and a half-second — equal-ts and
  // tolerance-boundary hits are COMMON, not lucky
  private val microGen: Gen[Long] = for {
    sec <- Gen.chooseNum(0L, 5L)
    off <- Gen.oneOf(0L, 1L, 999999L, 500000L)
  } yield sec * 1000000L + off

  private val asofCase: Gen[(List[(Int, Long)], List[(Int, Long, Double)])] =
    for {
      nl <- Gen.chooseNum(0, 25)
      nr <- Gen.chooseNum(0, 25)
      // keys 1..4 with both sides drawing independently → empty groups on
      // either side happen regularly
      left <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1, 4), microGen))
      right <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(1, 4)
        t <- microGen
        v <- Gen.chooseNum(1, 999)
      } yield (k, t, v.toDouble))
    } yield (left, right.distinctBy(r => (r._1, r._2))) // contract: right unique per (key, ts)

  private val rangeCase: Gen[(List[(Int, Long)], List[(Int, Long, Long, Double)], Long)] =
    for {
      bucket <- Gen.oneOf(5L, 7L)
      nl <- Gen.chooseNum(0, 25)
      nr <- Gen.chooseNum(0, 15)
      left <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(0L, 60L)))
      right <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(1, 3)
        s <- Gen.chooseNum(0L, 60L)
        d <- Gen.chooseNum(0L, bucket) // zero-length up to exactly one bucket
        v <- Gen.chooseNum(1, 999)
      } yield (k, s, s + d, v.toDouble))
    } yield (left, right, bucket)

  // ---- brute-force references ---------------------------------------

  private def bruteAsof(left: Seq[(Int, Long)], right: Seq[(Int, Long, Double)],
                        forward: Boolean, tolSeconds: Option[Long])
      : Seq[(Int, Long, Option[Long], Option[Double])] =
    left.map { case (k, t) =>
      val cands = right.filter(r =>
        r._1 == k && (if (forward) r._2 >= t else r._2 <= t))
      val best =
        if (cands.isEmpty) None
        else Some(if (forward) cands.minBy(_._2) else cands.maxBy(_._2))
      val bounded = best.filter(b =>
        tolSeconds.forall(tol => math.abs(b._2 - t) <= tol * 1000000L))
      (k, t, bounded.map(_._2), bounded.map(_._3))
    }

  private def bruteRange(left: Seq[(Int, Long)],
                         right: Seq[(Int, Long, Long, Double)])
      : Seq[(Int, Long, Long, Long, Double)] =
    for {
      (k, t) <- left
      (rk, s, e, v) <- right
      if rk == k && s <= t && t <= e
    } yield (k, t, s, e, v)

  // ---- frames --------------------------------------------------------

  private def leftDf(rows: Seq[(Int, Long)]): DataFrame =
    rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))

  private def rightDf(rows: Seq[(Int, Long, Double)]): DataFrame =
    rows.toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))

  private def runAsof(l: Seq[(Int, Long)], r: Seq[(Int, Long, Double)],
                      forward: Boolean, tol: Option[Long]): Unit = {
    val got = AsofJoin.asofJoin(leftDf(l), rightDf(r), on = Seq("user_id"),
        toleranceSeconds = tol, forward = forward)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        unix_micros(col("asof_ts")).as("mt"), col("asof_value"))
      .collect()
      .map(x => (x.getInt(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)),
        if (x.isNullAt(3)) None else Some(x.getDouble(3))))
      .toSeq.sorted(caseOrd)
    val want = bruteAsof(l, r, forward, tol).sorted(caseOrd)
    assert(got == want,
      s"asof(forward=$forward, tol=$tol) diverged\n left=$l\n right=$r\n" +
        s" got =$got\n want=$want")
  }

  private val caseOrd =
    Ordering.by[(Int, Long, Option[Long], Option[Double]), (Int, Long, Long, Double)] {
      case (k, t, mt, mv) => (k, t, mt.getOrElse(Long.MinValue), mv.getOrElse(0.0))
    }

  // ---- the fuzz runs -------------------------------------------------

  test("asof backward: 40 seeded cases agree with the brute-force reference") {
    samples(asofCase, 40, 1000L).foreach { case (l, r) =>
      runAsof(l, r, forward = false, tol = None)
    }
  }

  test("asof forward: 30 seeded cases agree with the brute-force reference") {
    samples(asofCase, 30, 2000L).foreach { case (l, r) =>
      runAsof(l, r, forward = true, tol = None)
    }
  }

  test("asof with tolerance (both directions): 30 seeded cases agree") {
    samples(Gen.zip(asofCase, Gen.oneOf(0L, 1L, 2L), Gen.oneOf(false, true)),
        30, 3000L)
      .foreach { case ((l, r), tol, fwd) =>
        runAsof(l, r, forward = fwd, tol = Some(tol))
      }
  }

  test("range join: 30 seeded cases agree with the brute-force reference") {
    samples(rangeCase, 30, 4000L).foreach { case (l, r, bucket) =>
      val lf = l.toDF("user_id", "t")
      val rf = r.toDF("user_id", "s", "e", "value")
      val got = RangeJoin.pointInInterval(lf, rf, on = Seq("user_id"),
          tsCol = "t", startCol = "s", endCol = "e",
          bucketSeconds = bucket, rightCols = Seq("value"))
        .select("user_id", "t", "s", "e", "value")
        .collect()
        .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3),
          x.getDouble(4)))
        .toSeq.sorted
      val want = bruteRange(l, r).sorted
      assert(got == want,
        s"range(bucket=$bucket) diverged\n left=$l\n right=$r\n" +
          s" got =$got\n want=$want")
    }
  }
}
