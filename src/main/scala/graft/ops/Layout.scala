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

  /** MONOTONE 63-bit long surrogate of one z-order key column — what the
    * multi-column clustering interleave actually consumes. Exact for the
    * discrete orderable types: integrals/booleans map directly, dates to
    * their epoch day, timestamps to `unix_micros` (zone-free physical
    * value), strings to their first-7-byte big-endian UTF-8 prefix
    * (order-preserving; coarse past 7 bytes, which is what clustering
    * needs — not equality). Float/double/decimal are REFUSED by name:
    * continuous keys round, so "cluster by price" silently degrades —
    * cluster by a bucketed/integerized derivative instead (the same
    * refusal rationale as partition-spec validation).
    */
  def zSurrogate(name: String, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    val c = col(s"`$name`")
    dt match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType => c.cast("long")
      case DateType => datediff(c, to_date(lit("1970-01-01"))).cast("long")
      case TimestampType => unix_micros(c)
      case StringType =>
        // right-pad to exactly 7 bytes so "b" (0x62) sorts after "ab"
        // (0x6162…) the way string order does; 14 hex digits < 2^56 keeps
        // conv's unsigned parse inside the positive long domain
        conv(hex(rpad(encode(c, "UTF-8"), 7, Array[Byte](0))), 16, 10).cast("long")
      case other => throw new IllegalArgumentException(
        s"z-order column '$name' has type ${other.catalogString}; multi-column " +
          "clustering supports integral/boolean/date/timestamp/string keys only " +
          "(float/double/decimal round — cluster on a bucketed or integerized " +
          "derivative instead)")
    }
  }

  /** The n-column clustering key for a compaction rewrite: each column's
    * [[zSurrogate]] is RANGE-NORMALIZED into the interleave's uniform
    * ⌊63/n⌋-bit budget before the Morton shuffle — [[zValueN]] masks LOW
    * bits, so an un-normalized wide domain (ids in the billions, micros
    * timestamps) would alias high bits away and destroy the clustering.
    * Normalization is one skinny min/max aggregate over exactly the key
    * columns (column-pruned scan — noise next to the full rewrite that
    * follows) and a per-column monotone
    * `((v >> excess) − (min >> excess)) << uplift`: the excess shift fits
    * a WIDE span into the budget, the uplift TOP-ALIGNS a narrow span in
    * it — without the uplift a 10-bit column interleaved against a
    * 31-bit one contributes only sub-file-granularity bits and gets no
    * clustering at all (equal budgets need equal EFFECTIVE resolution —
    * the equi-width form of Delta's OPTIMIZE ZORDER range-id
    * normalization, in exact integer arithmetic).
    */
  def zClusterKey(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 8,
      s"multi-column z-order takes 2 to 8 columns, got ${cols.size}")
    val fields = cols.map(n => df.schema.fields.find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"z-order column '$n' is not in the schema " +
          df.schema.fieldNames.mkString("(", ", ", ")"))))
    val surrogates = fields.map(f => zSurrogate(f.name, f.dataType))
    val budget = 63 / cols.size
    val aggs = surrogates.zipWithIndex.flatMap { case (s, i) =>
      Seq(min(s).as(s"__zlo$i"), max(s).as(s"__zhi$i")) }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val normalized = surrogates.zipWithIndex.map { case (s, i) =>
      if (row.isNullAt(2 * i)) s // all-NULL column: nothing to normalize
      else {
        val lo = row.getLong(2 * i)
        val hi = row.getLong(2 * i + 1)
        // smallest arithmetic shift under which the span fits the budget
        // — BigInt sidesteps (hi - lo) overflow on full-range domains
        var excess = math.max(0, (BigInt(hi) - BigInt(lo)).bitLength - budget)
        while (((hi >> excess) - (lo >> excess)) >= (1L << budget)) excess += 1
        val span = (hi >> excess) - (lo >> excess)
        val spanBits = 64 - java.lang.Long.numberOfLeadingZeros(span) // 0 for span 0
        val uplift = budget - spanBits // ≥ 0: the span already fits
        shiftleft(shiftright(s, excess) - lit(lo >> excess), uplift)
      }
    }
    zValueN(df.sparkSession, normalized: _*)
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
    // SIBLING temp dir via Path arithmetic, never string concatenation: a
    // trailing-slash `dir` would make "dir" + ".compact-tmp" a CHILD of
    // the data directory, and the recursive delete below would destroy
    // the fresh rewrite along with the originals — total data loss
    val tmp = new org.apache.hadoop.fs.Path(hadoopPath.getParent,
      hadoopPath.getName + ".compact-tmp")
    spark.read.parquet(dir).repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(hadoopPath, true)
    // the rename is the publish step — a silent false here would leave
    // the data gone and the rewrite stranded under the temp name
    require(fs.rename(tmp, hadoopPath),
      s"compact: rename $tmp -> $hadoopPath failed; rewrite preserved at $tmp")
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
    *
    * Keys go through [[zClusterKey]]'s range normalization (one skinny
    * min/max aggregate — noise next to the rewrite): the interleave masks
    * LOW bits, so feeding raw wide-domain values (billion-scale ids,
    * epoch micros) would alias the high bits away and silently destroy
    * the clustering, and it's what admits date/timestamp/string keys
    * (the [[graft.catalog.SnapshotTable.compact]] path's discipline).
    */
  def clusterByZN(
      df: DataFrame,
      cols: Seq[String],
      numPartitions: Int = 32): DataFrame = {
    require(cols.size >= 2 && cols.size <= 8,
      s"clusterByZN takes 2 to 8 columns, got ${cols.size}")
    val z = zClusterKey(df, cols).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
