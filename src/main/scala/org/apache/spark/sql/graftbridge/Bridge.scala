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

  /** The ANALYZED Catalyst condition of `df`'s top-level Filter — the input
    * the manifest-level file skipper walks. Spark 4's classic `Column` is a
    * tree of connect-style ColumnNodes (`UnresolvedFunction(">=", …)`), not
    * Catalyst comparisons, so the only faithful way to a walkable predicate
    * is through the session analyzer — which also performs the type
    * coercion (int column vs long literal, string literal vs date column)
    * the stats comparison depends on.
    */
  def analyzedFilterCondition(df: DataFrame):
      Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed match {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => Some(f.condition)
      case _ => None
    }

  /** The id of the RDD a `localCheckpoint()`ed Dataset pins: its analyzed
    * plan is a `LogicalRDD` wrapping exactly the persisted internal RDD.
    * Reading it off the plan identifies the pinned blocks WITHOUT diffing
    * the context-global persistent-RDD registry — two iterative loops
    * checkpointing concurrently can never capture (and later unpersist)
    * each other's blocks.
    */
  def checkpointedRddId(df: DataFrame): Option[Int] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd.id)
      case _ => None
    }

  /** Execute `df` and return its rows in Spark's INTERNAL representation —
    * what a DSv2 `LocalScan` must serve. Metadata-sized frames only (the
    * result materializes on the driver, which is the point of LocalScan).
    */
  def collectInternal(df: DataFrame): Array[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan.executeCollect()

  /** Re-root a batch frame as a STREAMING logical plan (`LogicalRDD` with
    * isStreaming = true): what a DSv1 streaming Source must return from
    * `getBatch` — MicroBatchExecution asserts the plan is streaming. The
    * RDD is the frame's planned execution, so the batch's whole pipeline
    * (manifest-pruned scans included) still runs where it was planned.
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    classic.Dataset.ofRows(spark, org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, qe.toRdd, isStreaming = true)(spark))
  }
}
