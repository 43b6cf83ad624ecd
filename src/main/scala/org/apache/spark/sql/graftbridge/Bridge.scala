package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private-API bridge: build a DataFrame from a custom
  * LogicalPlan node (`Dataset.ofRows` is private[sql]). The standard
  * pattern for Spark extension libraries that introduce their own
  * logical operators. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Unpersist the RDD behind a `localCheckpoint()`ed DataFrame.
    * `Dataset.unpersist` only talks to the CacheManager and never
    * releases checkpoint storage, so superseded generations of an
    * iterative loop (connected components, k-core, label propagation)
    * otherwise stay in the block store until the ContextCleaner happens
    * to GC them — the storage-hygiene gap behind the r17 SoakSpec
    * finding. No-op for plans that are not checkpoint-backed. */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
}
