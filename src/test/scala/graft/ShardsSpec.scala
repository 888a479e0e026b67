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

  test("TFRecord export: CRC-checked roundtrip in placement order, byte-identical re-runs") {
    import graft.ops.TfRecord
    val docs = Tables.documents(spark, sfDir).limit(200)
    val placed = Shards.deterministicShards(docs, seed = 7L, shardSize = 64L)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("shard"), col("pos"), col("text").cast("binary").as("payload"))
    val out1 = java.nio.file.Files.createTempDirectory("graft-tfr1")
    val nShards = TfRecord.writeShards(placed, out1.toString)
    assert(nShards == math.ceil(200.0 / 64).toInt)

    // roundtrip through the CRC-checking reader: concatenated shards in
    // order must replay the exact placement order
    val expect = Shards.deterministicShards(docs, seed = 7L, shardSize = 64L)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .orderBy("shard", "pos").select("text").as[String].collect().toSeq
    val files = (0 until nShards).map(i => out1.resolve(f"shard-$i%05d.tfrecord"))
    files.foreach(f => assert(java.nio.file.Files.exists(f), s"missing $f"))
    val got = files.flatMap(f => TfRecord.readFile(f)).map(new String(_, "UTF-8"))
    assert(got == expect, "replayed payload order diverges from the placement order")
    // temp-then-rename commit: no attempt debris survives a clean export
    assert(!java.nio.file.Files.exists(out1.resolve("_tmp")),
      "export left _tmp attempt files behind")
    // every shard but the last is exactly full
    files.init.foreach(f => assert(TfRecord.readFile(f).size == 64))

    // re-export → byte-identical files (the resume/audit contract)
    val out2 = java.nio.file.Files.createTempDirectory("graft-tfr2")
    TfRecord.writeShards(placed, out2.toString)
    files.indices.foreach { i =>
      val a = java.nio.file.Files.readAllBytes(out1.resolve(f"shard-$i%05d.tfrecord"))
      val b = java.nio.file.Files.readAllBytes(out2.resolve(f"shard-$i%05d.tfrecord"))
      assert(java.util.Arrays.equals(a, b), s"shard $i differs across re-runs")
    }

    // a gap in positions is refused, not silently misaligned
    val gappy = placed.filter(!(col("shard") === 0 && col("pos") === 3))
    val e = intercept[org.apache.spark.SparkException] {
      TfRecord.writeShards(gappy, java.nio.file.Files.createTempDirectory("graft-tfr3").toString)
    }
    assert(e.getMessage != null)
  }
}
