package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session configuration — the four mains each
  * hand-rolled the same builder, and config drift between the correctness
  * and bench surfaces is exactly the kind of skew that makes numbers
  * incomparable.
  *
  * The knobs and why (the same settings scale to a real cluster; only the
  * values change):
  * - `spark.sql.shuffle.partitions` = parallelism: sized to cores here; on
  *   a cluster, size so post-shuffle partitions land near
  *   `maxPartitionBytes` (or let AQE coalesce with a high initial count).
  * - `spark.sql.adaptive.enabled`: runtime re-planning — skew-join
  *   splitting, partition coalescing, runtime broadcast decisions.
  * - session timezone pinned UTC: every date/timestamp computation in the
  *   oracle contract assumes it.
  * - graft extensions registered at build time so SQL text resolves the
  *   native expressions and the TopKPerKey strategy/rewrite are active
  *   everywhere, not only after the first DataFrame-API call.
  */
object Sessions {

  def local(
      cores: Int,
      appName: String = "graft",
      warehouseDir: Option[String] = None,
      adaptive: Boolean = true): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", adaptive.toString)
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      // INT64 micros, not the deprecated INT96: INT96 carries no usable
      // footer statistics, and the snapshot layer's per-file pruning
      // bounds come straight from footers (FooterStats)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // committer v2: task outputs move straight to the destination at task
      // commit instead of a second job-commit rename pass. v2's weaker
      // failure story (partial task files visible on job abort) is masked
      // for every mutating sink in this engine — SnapshotTable writes land
      // in a private c-<uuid> dir that no reader resolves until the
      // manifest rename publishes it, and vacuum reclaims abandoned files
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      // storage-partitioned joins ON from session start: snapshot tables
      // written with partition transforms report KeyGroupedPartitioning
      // and join exchange-free (one side may shuffle INTO the bucket
      // domain). Spark defaults these off out of foreign-catalog caution;
      // this engine's catalog is the one being read, and flipping them
      // mid-run (as a query or loader side effect) would make the SAME
      // query plan differently depending on what ran before it — exactly
      // what the shuffle-byte adjudication artifacts must never depend on
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      .config("spark.ui.enabled", "false")
    warehouseDir.foreach(d => b.config("spark.sql.warehouse.dir", d))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Cores requested via SPARK_GRAFT_CPUS (driver contract), default 4. */
  def coresFromEnv: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
}
