package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Narrow bridge to `private[sql]` constructors that a whole-operator
  * extension genuinely needs: turning a custom [[LogicalPlan]] node into
  * a user-facing DataFrame. This is the standard route third-party Spark
  * operator libraries take (a one-object package escape hatch, not a
  * fork): Spark's extension points cover Rules/Strategies/functions but
  * expose no public `plan => DataFrame` entry.
  */
object SqlShims {

  /** Wrap a (resolved) logical plan as a DataFrame on `spark`. */
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed
}
