package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Z-order layout contract: the key is the exact bit interleave, bad
  * coordinates fail loudly, and the written layout both preserves rows and
  * range-partitions the key (files hold disjoint key ranges — the property
  * row-group pruning rides on).
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference interleave: bit i of dim j at key bit i·N + j. */
  private def morton(vals: Seq[Long], bits: Int): Long =
    (for {
      i <- 0 until bits
      (v, j) <- vals.zipWithIndex
    } yield ((v >> i) & 1L) << (i * vals.size + j)).reduce(_ | _)

  test("zorderKey equals the reference interleave (2 and 3 dims)") {
    val df = Seq((5L, 3L, 7L), (0L, 0L, 0L), (65535L, 1L, 2L),
      (1L, 65535L, 255L)).toDF("x", "y", "z")
    val got2 = df.select(AccessPatterns.zorderKey(Seq($"x", $"y"), 16))
      .as[Long].collect().toSeq
    val want2 = Seq((5L, 3L), (0L, 0L), (65535L, 1L), (1L, 65535L))
      .map(t => morton(Seq(t._1, t._2), 16))
    assert(got2 == want2)
    // 3-dim interleave on rows that fit 8 bits
    val small = Seq((5L, 3L, 7L), (0L, 0L, 0L)).toDF("x", "y", "z")
    val got3s = small.select(AccessPatterns.zorderKey(Seq($"x", $"y", $"z"), 8))
      .as[Long].collect().toSeq
    assert(got3s == Seq(morton(Seq(5L, 3L, 7L), 8), 0L))
  }

  test("the interleave is a bijection on the full 16x16 grid") {
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val keys = grid.map(t => morton(Seq(t._1, t._2), 4))
    assert(keys.distinct.size == 256) // injective
    assert(keys.min == 0L && keys.max == 255L) // onto [0, 2^8)
    // de-interleave recovers the coordinates
    def unmorton(z: Long, bits: Int): (Long, Long) = {
      var (x, y) = (0L, 0L)
      (0 until bits).foreach { i =>
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    grid.foreach { case (x, y) =>
      assert(unmorton(morton(Seq(x, y), 4), 4) == ((x, y)))
    }
  }

  test("z-order clusters: interleave of (1,1) sorts between (0,0) and (3,3)") {
    assert(morton(Seq(0L, 0L), 4) < morton(Seq(1L, 1L), 4))
    assert(morton(Seq(1L, 1L), 4) < morton(Seq(3L, 3L), 4))
  }

  test("zorderKey fails loudly on out-of-range and rejects bad arity") {
    val bad = Seq((-1L, 2L)).toDF("x", "y")
    val e = intercept[Exception] {
      bad.select(AccessPatterns.zorderKey(Seq($"x", $"y"), 8)).collect()
    }
    assert(e.getMessage.contains("z-order dim value out of"))
    intercept[IllegalArgumentException] {
      AccessPatterns.zorderKey(Seq($"x"), 8) // one dim: use fast_<dim>
    }
    intercept[IllegalArgumentException] {
      AccessPatterns.zorderKey(Seq($"x", $"y"), 32) // 64 bits: overflow
    }
  }

  test("optimizeZorder preserves rows and writes disjoint key ranges") {
    val df = (0 until 256).map(i => (i % 16, i / 16, i.toDouble))
      .toDF("a", "b", "v")
    val base = graft.core.TempDirs.scratch("zspec")
    // default layout is schema-identical: the sort key is dropped at write
    val bare = spark.read.parquet(AccessPatterns.optimizeZorder(
      df, graft.core.TempDirs.scratch("zspec_bare"), Seq("a", "b"),
      bits = 4, partitions = 4))
    assert(bare.columns.toSeq == df.columns.toSeq)
    val path = AccessPatterns.optimizeZorder(df, base, Seq("a", "b"),
      bits = 4, partitions = 4, keepKey = true)
    val re = spark.read.parquet(path)
    // same rows back
    assert(re.count() == 256)
    assert(re.agg(sum($"v")).as[Double].collect().head ==
      (0 until 256).map(_.toDouble).sum)
    // every key matches the reference interleave
    val mism = re.where($"_zkey" =!= AccessPatterns.zorderKey(
      Seq($"a", $"b"), 4)).count()
    assert(mism == 0)
    // files hold disjoint _zkey ranges (range partitioning by the key)
    val ranges = re.groupBy(input_file_name().as("f"))
      .agg(min($"_zkey").as("lo"), max($"_zkey").as("hi"))
      .orderBy($"lo")
      .select($"lo", $"hi").as[(Long, Long)].collect()
    assert(ranges.length > 1) // partitions=4 on 256 rows: multiple files
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
