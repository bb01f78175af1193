package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariant tests for the window-counter operators (G3-G6,
  * E4) over ScalaCheck-generated inputs with fixed seeds — the reference
  * covers these with ~600 lines of per-case unit tests
  * (`tests/unit/ingestion/test_segy_index_strategies.py`); properties cover
  * the same invariants across many random shapes.
  */
class CounterPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val headerGen: Gen[List[(Int, Int, Int)]] = for {
    n <- Gen.chooseNum(1, 80)
    rows <- Gen.listOfN(n, for {
      il <- Gen.chooseNum(1, 5)
      xl <- Gen.chooseNum(1, 5)
      ord <- Gen.chooseNum(1, 10000)
    } yield (il, xl, ord))
  } yield rows.distinctBy(_._3) // unique ordinal = file offset

  test("duplicateCounter: per-group counters are exactly 1..groupSize") {
    samples(headerGen, 25).foreach { rows =>
      val df = rows.toDF("il", "xl", "ord")
      val got = Counters.duplicateCounter(df, Seq("il", "xl"), Seq("ord"))
        .select("il", "xl", "ord", "trace")
        .as[(Int, Int, Int, Long)].collect()
      got.groupBy(r => (r._1, r._2)).foreach { case (_, group) =>
        assert(group.map(_._4).sorted.toSeq == (1L to group.length).toSeq)
        // counter order == ordinal (file) order within the group
        assert(group.sortBy(_._3).map(_._4).toSeq == (1L to group.length).toSeq)
      }
    }
  }

  test("rebaseChannels: per-cable min is 1, gaps/order/count preserved") {
    samples(headerGen, 25).foreach { rows =>
      val df = rows.toDF("cable", "chan", "ord")
      val rebased = Wrapping.rebaseChannels(df, "cable", "chan")
        .select("cable", "chan", "channel_wrapped")
        .as[(Int, Int, Long)].collect()
      assert(rebased.length == rows.length)
      rebased.groupBy(_._1).foreach { case (_, group) =>
        assert(group.map(_._3).min == 1L)
        // rebase is a shift: differences preserved exactly
        group.sortBy(_._2).sliding(2).foreach {
          case Array(a, b) => assert(b._3 - a._3 == (b._2 - a._2).toLong)
          case _ =>
        }
      }
    }
  }

  test("shotIndexDenseRank: searchsorted semantics over per-line uniques") {
    samples(headerGen, 25).foreach { rows =>
      val df = rows.toDF("line", "shot", "ord")
      val got = Wrapping.shotIndexDenseRank(df, "line", "shot")
        .select("line", "shot", "shot_index").as[(Int, Int, Long)].collect()
      got.groupBy(_._1).foreach { case (_, group) =>
        val uniques = group.map(_._2).distinct.sorted
        group.foreach { case (_, shot, idx) =>
          assert(idx == uniques.indexOf(shot).toLong) // np.searchsorted
        }
      }
    }
  }

  test("withGlobalSeq: seq is the permutation index of the sort order") {
    samples(headerGen, 10).foreach { rows =>
      val df = rows.toDF("a", "b", "ord").repartition(3)
      val got = GlobalOrder.withGlobalSeq(df, Seq("a", "b", "ord"))
        .select("a", "b", "ord", "seq").as[(Int, Int, Int, Long)].collect()
      assert(got.map(_._4).sorted.toSeq == (0L until rows.length).toSeq)
      val bySeq = got.sortBy(_._4).map(r => (r._1, r._2, r._3))
      assert(bySeq.toSeq == rows.sortBy(r => (r._1, r._2, r._3)).toSeq)
    }
  }

  test("summaryStats sums match exact BigDecimal accumulation") {
    val valueGen = for {
      n <- Gen.chooseNum(1, 200)
      vs <- Gen.listOfN(n, Gen.chooseNum(-99999, 99999).map(_ / 100.0))
    } yield vs
    samples(valueGen, 15).foreach { vs =>
      val nonZero = vs.filter(_ != 0.0)
      if (nonZero.nonEmpty) {
        val df = vs.toDF("x")
        val r = Stats.summaryStats(df, "x").collect().head
        val exact = nonZero.map(BigDecimal(_)).sum.toDouble
        assert(r.getAs[Double]("sum_val") == exact)
        assert(r.getAs[Long]("n") == nonZero.length.toLong)
      }
    }
  }
}
