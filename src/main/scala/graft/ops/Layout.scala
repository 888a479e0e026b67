package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: how the table is ARRANGED decides what a 100 TB
  * scan can skip. Partition pruning handles one column; z-ordering clusters
  * two at once, so parquet row-group min/max stats prune on either.
  */
object Layout {

  /** The z-value column (see [[graft.expressions.ZOrder2]]). */
  def zValue(spark: org.apache.spark.sql.SparkSession, x: Column, y: Column): Column = {
    graft.extensions.GraftExtensions.register(spark)
    call_function("zorder2", x.cast("long"), y.cast("long"))
  }

  /** Cluster `df` by the Morton order of (xCol, yCol): range-partition on
    * the z-value (balanced output files via range sampling), sort within
    * each partition. Written out, every file then covers a small rectangle
    * of the (x, y) domain — filters on EITHER column prune row groups.
    * Purely a reordering: the row multiset is untouched.
    */
  def clusterByZ(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numPartitions: Int = 32): DataFrame = {
    val z = zValue(df.sparkSession, col(xCol), col(yCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
