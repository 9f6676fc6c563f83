package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Package-internal bridge: build a DataFrame from a custom LogicalPlan
  * (Dataset.ofRows is private[sql]; this is the conventional extension-point
  * shim used by Spark libraries that add logical operators). */
object GraftSql {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(session.asInstanceOf[ClassicSparkSession], plan)
}
