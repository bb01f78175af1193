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

  test("grouped registers equal the per-group single sketches") {
    val keys = (0 until 600).map(i => (s"g${i % 3}", s"k$i")).toDF("g", "k")
    val grouped = Hll.registersByGroup(keys, "k", "g")
    (0 until 3).foreach { gi =>
      val single = Hll.registers(keys.where($"g" === s"g$gi"), "k")
        .orderBy("j").collect().toSeq
      val slice = grouped.where($"g" === s"g$gi")
        .select("j", "m_j").orderBy("j").collect().toSeq
      assert(slice == single, s"group g$gi registers diverge")
    }
    val est = Hll.estimateByGroup(grouped, "g").collect()
    assert(est.length == 3)
    est.foreach(r =>
      assert(math.abs(r.getAs[Double]("est_n") - 200) / 200 < 0.5))
  }

  test("estimateWithExact equals the two-pass estimate × countDistinct form") {
    // duplicates included so per-register countDistinct is exercised
    val keys = (0 until 4000).map(i => s"key${i % 1500}").toDF("k")
    val one = Hll.estimateWithExact(keys, "k").collect().head
    val two = Hll.estimate(Hll.registers(keys, "k"))
      .crossJoin(broadcast(keys.agg(countDistinct($"k").as("true_n"))))
      .collect().head
    assert(one.getAs[Double]("est_n") == two.getAs[Double]("est_n"))
    assert(one.getAs[Long]("n_zero_registers") ==
      two.getAs[Long]("n_zero_registers"))
    assert(one.getAs[Long]("true_n") == two.getAs[Long]("true_n"))
    assert(one.getAs[Long]("true_n") == 1500L)
    assert(one.schema.fieldNames.toSeq ==
      Seq("est_n", "n_zero_registers", "true_n"))
  }

  test("capPerGroup keeps at most cap rows per group, deterministically") {
    val df = (0 until 500).map(i => (i.toLong, s"s${i % 4}"))
      .toDF("doc_id", "source")
    val a = Sampling.capPerGroup(df, "source", cap = 7)
    val counts = a.groupBy($"source").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.forall(_ == 7L) && counts.size == 4)
    // stable kept set across reruns and repartitioning
    val b = Sampling.capPerGroup(df.repartition(13), "source", cap = 7)
    assert(a.select("doc_id").as[Long].collect().sorted.toSeq ==
      b.select("doc_id").as[Long].collect().sorted.toSeq)
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
