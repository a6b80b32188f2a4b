package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Minimal package bridge into `private[sql]` surface: wrapping a custom
 * [[LogicalPlan]] node back into a user-facing [[DataFrame]]
 * (`Dataset.ofRows` — the same entry every DataFrame construction in
 * Spark itself uses). This is the standard extension-library pattern for
 * exposing custom operators programmatically; everything else about the
 * operator (strategy, exec) goes through the public
 * `SparkSessionExtensions` API.
 */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
