package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands near the true cardinality (raw HLL, m=64)") {
    val keys = (0 until 5000).map(i => s"key$i").toDF("k")
    val row = Hll.estimate(Hll.registers(keys, "k")).collect().head
    val est = row.getAs[Double]("est_n")
    // standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - 5000) / 5000 < 0.4, s"est=$est for n=5000")
    assert(row.getAs[Long]("n_zero_registers") == 0L)
  }

  test("registers merge with max: sketch(a ∪ b) == max(sketch(a), sketch(b))") {
    val a = (0 until 300).map(i => s"a$i").toDF("k")
    val b = (0 until 300).map(i => s"b$i").toDF("k")
    val merged = Hll.registers(a, "k").withColumnRenamed("m_j", "ma")
      .join(Hll.registers(b, "k").withColumnRenamed("m_j", "mb"), "j")
      .select($"j", greatest($"ma", $"mb").as("m_j"))
    val direct = Hll.registers(a.unionAll(b), "k")
    assert(merged.orderBy("j").collect().toSeq ==
      direct.orderBy("j").collect().toSeq)
  }

  test("duplicate keys do not move the estimate; tiny sets flag the " +
       "exact-count fallback") {
    val once = (0 until 1000).map(i => s"k$i").toDF("k")
    val thrice = (0 until 3000).map(i => s"k${i % 1000}").toDF("k")
    assert(Hll.estimate(Hll.registers(once, "k")).collect().head.getDouble(0) ==
      Hll.estimate(Hll.registers(thrice, "k")).collect().head.getDouble(0))
    val tiny = Seq("a", "b", "c").toDF("k")
    val row = Hll.estimate(Hll.registers(tiny, "k")).collect().head
    assert(row.getAs[Long]("n_zero_registers") > 32,
      "a tiny set must leave most registers empty (the fallback signal)")
  }
}
