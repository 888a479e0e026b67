package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + fixed-size sharding for training-data
  * export.
  *
  * A pretraining run wants the corpus in a fixed pseudo-random order, cut
  * into equal-size shards, and it wants the SAME order on every re-run —
  * resume after a crash, re-export after a fix, audit in another engine.
  * Seeded `rand()` cannot promise that (task retries and engine differences
  * both break it); the order key here is md5(id || '-' || seed), which any
  * engine reproduces byte-for-byte and is as shuffled as a training order
  * needs to be. Reference scope: the reference ETL materializes ordered
  * extracts (`scripts/oracle_to_snowflake.py:32-36` materializes the full ordered extract);
  * fixed-size shard placement is the training-pipeline extension of that.
  */
object Shards {

  /** (doc_id, shard, pos): each row's exact placement when the corpus is
    * laid out in md5(id, seed) order and cut into `shardSize`-row shards —
    * shard = position div shardSize, pos = position mod shardSize; every
    * shard except the last is exactly full.
    *
    * The global ORDER is the contract, but a global-window ROW_NUMBER (the
    * whole corpus through one task) is not acceptable at scale. Positions
    * are computed hierarchically instead:
    *
    *  1. rows bucket by the first hash byte — 256 uniform buckets with
    *     FIXED boundaries (no range-partitioner sampling job, so placement
    *     can never wobble between runs);
    *  2. each bucket numbers its rows under a partitioned window;
    *  3. per-bucket row counts — 256 longs of driver state — prefix-sum
    *     into offsets that lift local numbers to global positions via a
    *     broadcast join.
    *
    * The only frame shuffled is (id, 32-char hash); the document payload
    * stays behind and rejoins placements by id. The offsets window runs on
    * a 256-row frame — single-task there is the point, not a bottleneck.
    */
  def deterministicShards(
      df: DataFrame,
      idCol: String = "doc_id",
      seed: Long = 42L,
      shardSize: Long = 1024L): DataFrame = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    // a NULL id hashes to a NULL bucket, which would (a) silently DROP
    // the row at the offsets equi-join and (b) sort first in the offsets
    // window, shifting every real bucket's offset so positions no longer
    // start at 0 — corrupting the dense (shard, pos) contract two ways at
    // once. Refuse in-plan (raise_error is codegen'd — no extra job).
    val keyed = df
      .select(col(idCol).as("doc_id"),
        when(col(idCol).isNull, raise_error(lit(
          s"deterministicShards: NULL $idCol — every row must carry a non-null id")))
          .otherwise(md5(concat(col(idCol).cast("string"), lit("-" + seed)))).as("h"))
      .withColumn("b", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
    val offsets = keyed.groupBy(col("b")).agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("off"))
    keyed
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("b")).orderBy(col("h"), col("doc_id"))))
      .join(broadcast(offsets), "b")
      .select(col("doc_id"),
        expr(s"(off + rn - 1) div ${shardSize}L").as("shard"),
        pmod(col("off") + col("rn") - 1, lit(shardSize)).as("pos"))
  }
}
