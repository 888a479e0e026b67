package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global order statistics WITHOUT a single-partition window. A partition-less
  * `Window.orderBy` moves the entire input through ONE task (Spark logs
  * `No Partition Defined for Window operation` for a reason) — fine for a
  * calendar-bounded daily aggregate, a 100 TB wall for anything fact-table
  * sized. The alternative is the range-partitioned rank reconstruction the
  * quantile spread path uses: sort-shuffle by the order key (parallelism =
  * `spark.sql.shuffle.partitions`), rank locally per partition, and add each
  * partition's global offset from a ≤P-row broadcast side frame.
  */
object Ranks {

  /** `df` + a global 1-based row number under `sort` (`rnName`) and, when
    * `nName` is set, the total row count — computed with a range-partitioned
    * sort, never a single-partition window. `sort` must be a total order for
    * the ranks to be deterministic (same contract as `row_number()`).
    *
    * EAGER: the range partitioner SAMPLES its child and two subtrees (the
    * per-partition counts and the rank join) consume the partitioned frame,
    * so it persists for one evaluation and is released once the (ranked)
    * result materializes — the exactQuantilesSpread discipline.
    */
  def withGlobalRowNumber(
      df: DataFrame,
      sort: Seq[Column],
      rnName: String = "__rn",
      nName: Option[String] = None): DataFrame = {
    require(sort.nonEmpty, "withGlobalRowNumber needs at least one sort column")
    val parted = df
      .repartitionByRange(sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // per-partition counts: ≤ shuffle.partitions rows — the windows over it
    // are metadata-scale by construction (the Shards offsets argument)
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
    val offW = Window.orderBy(col("__pid"))
    val offsets0 = counts
      .withColumn("__off", sum(col("__c")).over(offW) - col("__c"))
    val offsets = nName match {
      case Some(n) => offsets0.withColumn(n,
        sum(col("__c")).over(offW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      case None => offsets0
    }
    val localW = Window.partitionBy(col("__pid")).orderBy(sort: _*)
    val ranked = parted
      .join(broadcast(offsets.drop("__c")), "__pid")
      .withColumn(rnName, col("__off") + row_number().over(localW))
      .drop("__pid", "__off")
    graft.util.Caching.materialize(ranked, parted)
  }

  /** SQL `NTILE(k)` from a global rank: with n rows the first `n mod k`
    * buckets hold `⌈n/k⌉` rows, the rest `⌊n/k⌋` — the standard window
    * semantics (Spark and DuckDB agree), reproduced as pure rank arithmetic
    * so it composes with [[withGlobalRowNumber]] instead of forcing the
    * single-partition NTILE window. Pinned against `ntile()` by RanksSpec.
    */
  def ntileFromRank(k: Int, rn: Column, n: Column): Column = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    // exact non-negative integer division (the SQL `div` operator has no
    // Column-API spelling): a − a%b is an exact multiple of b, and IEEE
    // division of exactly-divisible longs under 2^53 is exact — ranks and
    // row counts stay far below that
    def ldiv(a: Column, b: Column): Column = ((a - a % b) / b).cast("long")
    val q = ldiv(n.cast("long"), lit(k.toLong))
    val rem = n.cast("long") % k
    val cut = rem * (q + 1) // rows 1..cut live in the ⌈n/k⌉-sized buckets
    when(rn <= cut, ldiv(rn - 1, q + 1) + 1)
      .otherwise(rem + ldiv(rn - cut - 1, q) + 1)
      .cast("int")
  }
}
