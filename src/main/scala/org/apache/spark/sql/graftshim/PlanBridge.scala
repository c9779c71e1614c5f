package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset

/** The one `private[sql]` seam the engine needs: turning a custom
  * [[LogicalPlan]] node into a user-facing DataFrame. Spark exposes
  * injection points for custom expressions, optimizer rules, and planner
  * strategies via SparkSessionExtensions, but offers no public
  * constructor for a DataFrame over a custom logical node — every
  * third-party whole-operator library bridges this same gap with a
  * shim package under `org.apache.spark.sql`. Kept to this single
  * forwarding call; everything else in the engine uses public API.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
