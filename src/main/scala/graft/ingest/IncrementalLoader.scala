package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental, idempotent append — the reference pipeline's core move
  * (`scripts/oracle_to_snowflake.py:76-110` and
  * `scripts/insert_ads_data.py:23-50`): keep only source rows whose key is
  * absent from the sink, then append.
  *
  * The reference does this as a driver-memory pandas merge with an indicator
  * column; here it is a single `left_anti` equi-join (SURVEY.md §2.3 J1) that
  * Catalyst plans as broadcast-hash anti join when the sink's key projection
  * is small, sort-merge anti otherwise — and AQE can re-plan at runtime.
  *
  * Scale note (SURVEY.md §7.5): at 100 TB the sink key scan must not be a
  * full scan. The sink is written **partitioned by `dt`**, so when the
  * incoming batch covers a bounded date range we prune the key scan to just
  * those partitions before the anti-join — the sink-side read is then
  * O(batch date span), not O(sink).
  */
object IncrementalLoader {

  val AdsKeys: Seq[String] = Seq("campaign_id", "adset_id", "creative_id", "dt")

  /** Rows of `source` whose `keys` are absent from `existing`. Both sides'
    * date keys must already be DateType (key-normalization precondition,
    * oracle_to_snowflake.py:43,81).
    */
  def newRows(source: DataFrame, existing: DataFrame, keys: Seq[String] = AdsKeys): DataFrame =
    source.join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** Null-safe variant for sinks whose keys may contain NULLs: uses `<=>` so
    * a NULL source key matches a NULL sink key (plain `=` never matches NULL,
    * which would re-append such rows on every run and break idempotence).
    */
  def newRowsNullSafe(source: DataFrame, existing: DataFrame, keys: Seq[String] = AdsKeys): DataFrame = {
    val src = source.alias("src")
    val ex = existing.select(keys.map(col): _*).alias("ex")
    val cond = keys.map(k => col(s"src.$k") <=> col(s"ex.$k")).reduce(_ && _)
    src.join(ex, cond, "left_anti")
  }

  /** Keyed upsert (MERGE): update-else-insert of `updates` into `target` on
    * `keys` — the modern lakehouse form of the reference's TRUNCATE+reload
    * (README.md:377-385), which rewrites the whole table to change any row.
    * A row of `updates` replaces the target row with the same key; keys
    * absent from the target are inserted. Relational form:
    * `updates ∪ (target ⟕̸ updates)` — one null-safe anti join, so Catalyst
    * broadcasts the (typically small) update batch and the target is
    * scanned once, never shuffled on its own size.
    *
    * Precondition: `updates` has at most one row per key (standard MERGE
    * ambiguity rule — enforce upstream; with several, all survive).
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String] = AdsKeys): DataFrame = {
    val kept = newRowsNullSafe(target, updates.select(keys.map(col): _*), keys)
    updates.select(target.columns.map(col).toIndexedSeq: _*).unionByName(kept)
  }

  /** [[upsert]] against a dt-partitioned parquet sink, rewriting ONLY the
    * partitions the batch touches (dynamic partition overwrite) — at 100 TB
    * a MERGE that rewrites the whole sink is the TRUNCATE+reload it was
    * supposed to replace. Because `dt` is part of the key, a matched target
    * row always lives in the same partition as its update, so untouched
    * partitions cannot contain stale versions.
    *
    * Batches with NULL dt are rejected: a null partition key would land in
    * the `__HIVE_DEFAULT_PARTITION__` bucket and dynamic overwrite of it is
    * ambiguous across engines — null-dt flows belong in [[appendNew]].
    */
  def mergeIntoSink(
      spark: SparkSession,
      batch: DataFrame,
      sinkPath: String,
      keys: Seq[String] = AdsKeys): Unit = {
    require(keys.contains("dt"), "mergeIntoSink requires dt in the merge key (partition column)")
    require(batch.filter(col("dt").isNull).isEmpty, "mergeIntoSink: batch has NULL dt rows")
    val sinkExists = new org.apache.hadoop.fs.Path(sinkPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(sinkPath))
    val out =
      if (!sinkExists) batch
      else {
        val sink = spark.read.parquet(sinkPath)
        // the rewrite reads only the touched partitions: semi join the sink
        // on the batch's distinct dt values (a broadcastable date list)
        val touched = sink.join(broadcast(batch.select("dt").distinct()), Seq("dt"), "left_semi")
        upsert(touched, batch, keys)
      }
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try out.write.mode("overwrite").partitionBy("dt").parquet(sinkPath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Idempotent append of `batch` into the parquet sink at `sinkPath`,
    * dt-partitioned. Re-running with the same batch appends 0 rows
    * (invariant i, SURVEY.md §5.1).
    */
  def appendNew(spark: SparkSession, batch: DataFrame, sinkPath: String, keys: Seq[String] = AdsKeys): Long = {
    val sinkExists = new org.apache.hadoop.fs.Path(sinkPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(sinkPath))

    val delta =
      if (!sinkExists) batch
      else {
        val sink = spark.read.parquet(sinkPath)
        // Partition pruning: restrict the sink key scan to the batch's date
        // span. min/max over the (small) batch is a cheap 2-value aggregate.
        // NULL-dt rows are never pruned away (the between() predicate would
        // silently drop them from the sink side and treat every null-dt batch
        // row as new); an all-null-dt batch skips pruning entirely.
        val pruned =
          if (keys.contains("dt")) {
            val r = batch.agg(min(col("dt")), max(col("dt"))).collect()(0)
            val (lo, hi) = (r.get(0), r.get(1))
            if (lo == null) sink // min==null => batch has no non-null dt; scan unpruned
            else sink.filter(col("dt").between(lit(lo), lit(hi)) || col("dt").isNull)
          } else sink
        // Null-safe anti-join: idempotence must hold for null-key rows too.
        newRowsNullSafe(batch, pruned, keys)
      }

    val cached = delta.cache()
    try {
      val n = cached.count()
      if (n > 0) // skip-empty guard (oracle_to_snowflake.py:104)
        cached.write.mode("append").partitionBy(keys.filter(_ == "dt"): _*).parquet(sinkPath)
      n
    } finally { cached.unpersist(); () }
  }
}
