package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.SparkSession

/** Bridge to the sql-package-private function registry, so the graft SQL
  * functions can be installed on a LIVE session (the
  * `spark.sql.extensions` path only applies at session construction).
  */
object FunctionInstaller {
  def register(spark: org.apache.spark.sql.SparkSession, id: FunctionIdentifier,
               info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
