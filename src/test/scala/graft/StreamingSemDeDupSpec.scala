package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dedup.SemDeDup
import graft.similarity.Similarity
import graft.streaming.{IncrementalClusters, StreamingSemDeDup}

/** Semantic dedup-on-ingest: the cell-state pair generator must emit
  * EXACTLY the batch SemDeDup edge set — on a batch frame, streamed in
  * halves through real state, and composed into the incremental clusters
  * fold — with bit-identical cosines (the JVM loop replicates the native
  * expression's evaluation order).
  */
class StreamingSemDeDupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ssd-$tag").toString

  // q153's fixture shape in miniature: base vectors + two perturbation
  // generations building A~B~C chains whose ends fall below the cut
  private lazy val corpus = {
    val base = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .filter($"id" < 300)
    val pert1 = base.filter($"id" < 40).select(($"id" + 1000000).as("id"),
      transform($"vec", (x, i) => when(i === 0, x + 0.01).otherwise(x)).as("vec"))
    val pert2 = base.filter($"id" < 20).select(($"id" + 2000000).as("id"),
      transform($"vec", (x, i) => when(i === 0, x + 0.02).otherwise(x)).as("vec"))
    base.union(pert1).union(pert2).persist()
  }

  private lazy val centroids: Seq[Seq[Double]] = corpus
    .filter(pmod($"id", lit(40)) === 0 && $"id" < 300).orderBy($"id")
    .collect().map(_.getSeq[Double](1).toIndexedSeq: Seq[Double]).toIndexedSeq

  /** The batch edge formula, literally (same cell, upper triangle, cosine
    * at or above the cut) — what semanticDedup feeds connectedComponents.
    */
  private def batchPairs(th: Double): Set[(Long, Long, Double)] = {
    val withCell = corpus
      .join(Similarity.assignEmbeddings(corpus, centroids).select($"id", $"cluster"), "id")
    val lhs = withCell.select($"cluster", $"id".as("id_a"), $"vec".as("vec_a"))
    val rhs = withCell.select($"cluster", $"id".as("id_b"), $"vec".as("vec_b"))
    lhs.join(rhs, Seq("cluster")).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        Similarity.nativeCosine(spark, $"vec_a", $"vec_b").as("cos"))
      .filter($"cos" >= th)
      .as[(Long, Long, Double)].collect().toSet
  }

  private def pairSet(ds: org.apache.spark.sql.Dataset[StreamingSemDeDup.SemPair])
      : Set[(Long, Long, Double)] =
    ds.collect().map(p => (p.id_a, p.id_b, p.cos)).toSet

  test("batch mode: pair set equals the batch SemDeDup edge formula, cosines bit-identical") {
    val want = batchPairs(0.99)
    assert(want.nonEmpty, "fixture produced no semantic-dup pairs")
    val got = pairSet(StreamingSemDeDup.semanticPairs(corpus, centroids, threshold = 0.99))
    assert(got == want) // exact doubles: the JVM loop must match the expression
  }

  test("streamed in halves: cross-batch pairs come through cell state; set equality holds") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val sinkTable = s"ssd_halves_${System.nanoTime()}"
    val q = StreamingSemDeDup.semanticPairs(
        mem.toDF.toDF("id", "vec"), centroids, threshold = 0.99)
      .writeStream.format("memory").queryName(sinkTable).outputMode("append").start()
    try {
      val rows = corpus.as[(Long, Seq[Double])].collect().toSeq
      val (h1, h2) = rows.partition(_._1 % 2 == 0)
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sinkTable).as[(Long, Long, Double)].collect().toSet
    assert(got == batchPairs(0.99))
  }

  test("re-delivered ids are structural no-ops; emitted pairs never duplicate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val sinkTable = s"ssd_redeliver_${System.nanoTime()}"
    val q = StreamingSemDeDup.semanticPairs(
        mem.toDF.toDF("id", "vec"), centroids, threshold = 0.99)
      .writeStream.format("memory").queryName(sinkTable).outputMode("append").start()
    try {
      val rows = corpus.as[(Long, Seq[Double])].collect().toSeq
      mem.addData(rows: _*); q.processAllAvailable()
      mem.addData(rows.take(30): _*); q.processAllAvailable() // replay a prefix
    } finally q.stop()
    val got = spark.table(sinkTable).as[(Long, Long, Double)].collect().toSeq
    assert(got.size == got.toSet.size, "replay emitted duplicate pairs")
    assert(got.toSet == batchPairs(0.99))
  }

  test("ingest loop: streamed pairs folded into IncrementalClusters equal semanticDedup reps") {
    val dir = tmp("loop")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = StreamingSemDeDup.semanticPairs(
        mem.toDF.toDF("id", "vec"), centroids, threshold = 0.99)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingSemDeDup.SemPair], _: Long) =>
        IncrementalClusters.foldPairs(spark, dir,
          batch.toDF().select($"id_a", $"id_b"))
        ()
      }
      .start()
    try {
      val rows = corpus.as[(Long, Seq[Double])].collect().toSeq
      val (h1, h2) = rows.partition(_._1 % 2 == 0)
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable()
    } finally q.stop()
    // every doc that appeared in a pair must carry the batch pipeline's rep
    val want = SemDeDup.semanticDedup(corpus, centroids, threshold = 0.99)
      .select($"id", $"rep_id").as[(Long, Long)].collect().toMap
    val got = IncrementalClusters.clusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (id, rep) =>
      assert(want(id) == rep, s"doc $id: fold rep $rep != batch ${want(id)}")
    }
    // and no paired doc is missing from the fold
    val paired = batchPairs(0.99).flatMap(p => Seq(p._1, p._2))
    assert(paired.subsetOf(got.keySet))
  }
}
