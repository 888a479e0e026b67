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

  /** The n-column z-value (see [[graft.expressions.ZOrderN]]): uniform
    * ⌊63/n⌋-bit budget per column, 2 ≤ n ≤ 8.
    */
  def zValueN(spark: org.apache.spark.sql.SparkSession, cols: Column*): Column = {
    graft.extensions.GraftExtensions.register(spark)
    call_function("zorder", cols.map(_.cast("long")): _*)
  }

  /** Small-file compaction — the table-maintenance counterpart of
    * [[clusterByZ]]: a sink that accumulates per-batch appends (the
    * incremental loader's normal life) degrades into thousands of tiny
    * files whose open/footer overhead dominates scans at 100 TB. Rewrite
    * the directory into ⌈total bytes / targetBytes⌉ files and swap it in.
    *
    * The swap is write-temp → delete-old → rename: atomic enough for a
    * maintenance window on HDFS-like filesystems. For concurrent readers
    * use [[graft.catalog.SnapshotTable.compact]] instead — the same rewrite
    * behind a manifest commit, so a reader either sees the old snapshot or
    * the new one, never a missing directory (proved by SnapshotSpec's
    * concurrent-reader test). This plain-directory variant remains for
    * sinks that aren't snapshot tables.
    *
    * @return (files before, files after)
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val hadoopPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hadoopPath).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact-tmp")
    spark.read.parquet(dir).repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(hadoopPath, true)
    fs.rename(tmp, hadoopPath)
    val after = fs.listStatus(hadoopPath)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, after)
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

  /** [[clusterByZ]] over 2-8 columns: range-partition + sort by the
    * n-column Morton value, so every written file covers a small
    * hyper-rectangle of the n-dimensional key domain and parquet min/max
    * stats prune on ANY of the clustered columns. The per-column
    * resolution is ⌊63/n⌋ bits — at n = 4 that is 15 bits (32k buckets
    * per column), still far finer than any realistic file count, so the
    * budget costs pruning nothing in practice. Purely a reordering.
    */
  def clusterByZN(
      df: DataFrame,
      cols: Seq[String],
      numPartitions: Int = 32): DataFrame = {
    require(cols.size >= 2 && cols.size <= 8,
      s"clusterByZN takes 2 to 8 columns, got ${cols.size}")
    val z = zValueN(df.sparkSession, cols.map(col): _*).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
