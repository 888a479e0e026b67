package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the custom-operator API needs:
  * constructing a DataFrame from a hand-built logical plan
  * (`Dataset.ofRows`). Spark exposes every other extension point —
  * functions, planner strategies, optimizer rules — through
  * `SparkSessionExtensions`, but plan construction itself has no public
  * equivalent, so this shim lives in an `org.apache.spark.sql` subpackage
  * (the standard pattern across Spark connector/extension libraries).
  * Nothing else in the engine reaches into Spark internals this way.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
