package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables sort-merge-join without any exchange") {
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 1.0)).toDF("k", "id", "v")
    val dims = (0L until 100L).map(i => (i, s"name$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", Seq("k"), 8)
    Bucketing.writeBucketed(dims, "b_dims", Seq("k"), 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
