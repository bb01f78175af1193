package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("row-identical to the plain join, even with duplicate keys both sides") {
    val facts = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "lv")
    val dims = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "rv")
    val got = SaltedJoin.join(facts, dims, Seq("k"), salts = 4)
      .select("k", "lv", "rv").as[(Long, String, String)].collect().sorted
    val want = facts.join(dims, "k")
      .select("k", "lv", "rv").as[(Long, String, String)].collect().sorted
    assert(got.sameElements(want))
    assert(want.length == 7) // 3 left x 2 right on key 1, 1 x 1 on key 2
  }

  test("the hot key spreads across salt buckets") {
    val hot = (0 until 1000).map(i => (42L, i)).toDF("k", "v")
    val salted = hot.withColumn("_salt",
      pmod(hash(hot.columns.map(col): _*), lit(8)))
    val buckets = salted.groupBy("_salt").count().count()
    assert(buckets > 4, s"1000 hot-key rows must land in >4 of 8 buckets, got $buckets")
  }

  test("rejects degenerate salt counts") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SaltedJoin.join(df, df, Seq("k"), salts = 1)
    }
  }
}
