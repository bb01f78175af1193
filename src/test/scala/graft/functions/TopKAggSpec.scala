package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window top-k, duplicate values and tiny groups included") {
    val df = (0 until 2000).map { i =>
      (i % 7, (i * 31 % 100).toDouble, i.toLong) // many duplicate values
    }.toDF("g", "v", "id").repartition(8)
    val got = df.groupBy($"g")
      .agg(TopKAgg.topK($"v", $"id", 5).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rank"), $"col.v", $"col.id")
      .as[(Int, Int, Double, Long)].collect().toSet
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val want = df.withColumn("rank", row_number().over(w))
      .where($"rank" <= 5).select($"g", $"rank", $"v", $"id")
      .as[(Int, Int, Double, Long)].collect().toSet
    assert(got == want)
    // a group smaller than k returns all its rows
    val small = Seq((1, 1.0, 1L), (1, 2.0, 2L)).toDF("g", "v", "id")
    assert(small.groupBy($"g").agg(size(TopKAgg.topK($"v", $"id", 5)))
      .as[(Int, Int)].collect().head._2 == 2)
  }

  test("aggregates in two phases (partial combine before the shuffle)") {
    val df = (0 until 100).map(i => (i % 3, i.toDouble, i.toLong))
      .toDF("g", "v", "id").repartition(4)
    val agg = df.groupBy($"g").agg(TopKAgg.topK($"v", $"id", 2).as("top"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg"),
      s"expected a partial aggregation phase:\n$plan")
  }

  test("null values and ids are skipped; k bounds are enforced") {
    val df = Seq((1, Some(1.0), Some(1L)), (1, None, Some(2L)),
      (1, Some(3.0), None)).toDF("g", "v", "id")
    val n = df.groupBy($"g").agg(size(TopKAgg.topK($"v", $"id", 3)))
      .as[(Int, Int)].collect().head._2
    assert(n == 1)
    intercept[IllegalArgumentException] { TopKAgg.topK($"v", $"id", 0) }
  }
}
