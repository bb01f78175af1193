package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IbmFloatSpec extends SparkSpec {
  import spark.implicits._

  // Public IBM S/360 hex-float examples (sign | excess-64 exp | 24-bit frac)
  private val cases = Seq(
    0x00000000 -> 0.0f,
    0x80000000 -> 0.0f,      // negative zero normalizes to 0
    0x41100000 -> 1.0f,      // 0.0625 × 16^1
    0x42640000 -> 100.0f,    // 0.390625 × 16^2
    0xc2760000 -> -118.0f,
    0xc276a000 -> -118.625f, // the classic worked example
    0x40800000 -> 0.5f,      // 0.5 × 16^0
  )

  test("scalar decode matches known IBM float bit patterns") {
    cases.foreach { case (bits, expected) =>
      assert(IbmFloatDecode.decode(bits) == expected,
        f"bits=0x$bits%08x")
    }
  }

  test("expression decodes under whole-stage codegen") {
    // repartition keeps a real execution stage (a pure local relation would
    // be constant-folded before codegen has anything to do)
    val df = cases.map(_._1).toDF("bits").repartition(2)
    val q = df.select(IbmFloatDecode(col("bits")).as("v"))
    assert(q.as[Float].collect().toSet == cases.map(_._2).toSet)
    q.collect() // finalize the adaptive plan before inspecting codegen stages
    // "*(n)" is the WholeStageCodegen marker in the abbreviated plan tree
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [ibm_float32"))
  }

  test("null propagates; SQL registration via extensions") {
    val df = Seq[Option[Int]](Some(0x41100000), None).toDF("bits")
    val got = df.select(IbmFloatDecode(col("bits"))).collect()
    assert(got(0).getFloat(0) == 1.0f && got(1).isNullAt(0))

    spark.sessionState.functionRegistry.registerFunction(
      IbmFloatDecode.functionDescription._1,
      IbmFloatDecode.functionDescription._2,
      IbmFloatDecode.functionDescription._3)
    val viaSql = spark.sql("SELECT ibm_float32(1113849856)").collect().head.getFloat(0)
    assert(viaSql == 100.0f) // 0x42640000
  }
}
