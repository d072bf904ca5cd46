package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to `private[sql]` Dataset plumbing (Spark 4's classic/connect
  * split hides `ofRows` and `logicalPlan`). Lives in the
  * org.apache.spark.sql namespace solely to satisfy the qualifier; used
  * by custom logical operators ([[graft.plans.TopKPerKey]]) to wrap a
  * plan node back into a DataFrame. Also registers the engine's planner
  * strategies imperatively so custom nodes plan even in sessions built
  * without `spark.sql.extensions` (the harness Verify/Bench sessions).
  */
object DatasetBridge {
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** Column → true catalyst Expression via the session's ColumnNode
    * converter. (`ExpressionUtils.expression` would hand back a lazy
    * `ColumnNodeExpression` adapter whose internal ColumnNode is not
    * serializable and never task-shippable.) */
  def expression(df: DataFrame, c: Column): Expression =
    df.sparkSession.asInstanceOf[classic.SparkSession].expression(c)

  /** Idempotently register the top-k strategy AND the window→top-k
    * optimizer rewrite on a session built without the extensions conf. */
  def registerTopK(spark: org.apache.spark.sql.SparkSession): Unit = {
    val s = spark.asInstanceOf[classic.SparkSession]
    if (!s.experimental.extraStrategies.contains(
        graft.plans.TopKPerKey.Strategy)) {
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ graft.plans.TopKPerKey.Strategy
    }
    if (!s.experimental.extraOptimizations.contains(
        graft.plans.TopKPerKey.RowNumberToTopK)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+
          graft.plans.TopKPerKey.RowNumberToTopK
    }
  }

  def ofRows(df: DataFrame, plan: LogicalPlan): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    registerTopK(spark)
    classic.Dataset.ofRows(spark, plan)
  }
}
