package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def keys = (0 until 1000).map(i => s"k${i % 37}").toDF("k")

  test("estimates never undercount, and are exact for every key when " +
       "buckets dwarf the key space") {
    val cnts = Cms.counters(keys, "k", d = 4, w = 64)
    assert(cnts.count() <= 4 * 64)
    val truth = keys.groupBy($"k").agg(count(lit(1)).as("true_n"))
    val est = Cms.estimate(cnts, truth, "k", d = 4, w = 64)
    val joined = est.join(truth, "k")
      .select($"k", $"est_n", $"true_n").as[(String, Long, Long)].collect()
    assert(joined.length == 37)
    joined.foreach { case (k, e, t) =>
      assert(e >= t, s"CMS undercounted $k: est=$e true=$t")
    }
    // 37 keys across 4 independent 64-bucket rows: the min-of-rows cell is
    // collision-free for (at least) most keys — require a majority exact,
    // which a broken hash or bucket math would fail immediately
    assert(joined.count { case (_, e, t) => e == t } > 18)
  }

  test("counters are deterministic across rebuilds") {
    val a = Cms.counters(keys, "k", d = 2, w = 16)
      .orderBy("i", "bucket").collect().toSeq
    val b = Cms.counters(keys.repartition(7), "k", d = 2, w = 16)
      .orderBy("i", "bucket").collect().toSeq
    assert(a == b)
  }
}
