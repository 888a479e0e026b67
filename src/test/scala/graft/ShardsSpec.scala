package graft

import org.apache.spark.sql.functions._
import graft.ops.Shards

/** Deterministic shuffle-sharding: the hierarchical (bucket window + offset
  * lift) placement must equal the one-task global ROW_NUMBER it refuses to
  * run, byte for byte, on every run.
  */
class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("placements equal the global-window truth; shards are exactly full") {
    val docs = Tables.documents(spark, sfDir)
    val shardSize = 16L
    val got = Shards.deterministicShards(docs, seed = 42L, shardSize = shardSize)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq

    // truth: the single-task global window the operator must avoid at scale
    // but a test fixture can afford
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("h"), col("doc_id"))
    val expect = docs
      .select(col("doc_id"), md5(concat(col("doc_id").cast("string"), lit("-42"))).as("h"))
      .withColumn("g", row_number().over(w).cast("long") - 1)
      .select(col("doc_id"), expr(s"g div $shardSize").as("shard"),
        pmod(col("g"), lit(shardSize)).as("pos"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == expect, "hierarchical placement diverged from the global-order truth")

    // every shard except the last is exactly full, positions are 0..n-1
    val byShard = got.groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    val lastShard = byShard.keys.max
    byShard.foreach { case (shard, poss) =>
      val n = if (shard == lastShard) poss.length.toLong else shardSize
      assert(poss == (0L until n), s"shard $shard positions: ${poss.take(5)}...")
      if (shard != lastShard)
        assert(poss.length.toLong == shardSize, s"shard $shard not full: ${poss.length}")
    }
  }

  test("placement is deterministic across runs and moves with the seed") {
    val docs = Tables.documents(spark, sfDir)
    val a = Shards.deterministicShards(docs, seed = 7L, shardSize = 32L)
      .orderBy("doc_id").collect().toSeq
    val b = Shards.deterministicShards(docs, seed = 7L, shardSize = 32L)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "same seed must reproduce identical placements")
    val c = Shards.deterministicShards(docs, seed = 8L, shardSize = 32L)
      .orderBy("doc_id").collect().toSeq
    assert(a != c, "a different seed must reshuffle the corpus")
  }
}
