package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.catalog.SnapshotTable
import graft.dedup.Dedup
import graft.ops.Graph
import graft.streaming.{IncrementalClusters, StreamingDedup}

/** The ingest-dedup loop end to end: streaming candidate pairs folded into
  * an incrementally-maintained cluster assignment must equal the batch
  * connected components of the full corpus — after any number of
  * micro-batches, under replays, and with singleton reps preserved.
  */
class IncrementalClustersSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-incc-$tag").toString

  private def assignment(dir: String): Map[Long, Long] =
    IncrementalClusters.clusters(spark, dir)
      .select(col("doc_id"), col("rep_id")).as[(Long, Long)].collect().toMap

  test("folding pair batches reproduces batch connected components at every step") {
    val dir = tmp("fold")
    // edges arriving over 4 batches; chain 1-2-3-4 built ACROSS batches so
    // folds must merge previously-separate components
    val batches = Seq(
      Seq((1L, 2L), (10L, 11L)),
      Seq((3L, 4L), (10L, 12L)),
      Seq((2L, 3L)),             // merges {1,2} and {3,4}
      Seq((20L, 21L), (1L, 4L))) // redundant edge inside a component
    val sofar = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    batches.foreach { b =>
      sofar ++= b
      IncrementalClusters.foldPairs(spark, dir, b.toDF("id_a", "id_b"))
      val want = Graph.connectedComponents(sofar.toSeq.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(assignment(dir) == want, s"diverged after batch $b")
    }
    assert(assignment(dir) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("empty batch is a no-op version-wise; replayed batch is idempotent") {
    val dir = tmp("idem")
    IncrementalClusters.foldPairs(spark, dir, Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"))
    val v1 = SnapshotTable.versions(spark, dir).max
    val a1 = assignment(dir)
    // empty fold: no new snapshot version
    IncrementalClusters.foldPairs(spark, dir, Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(SnapshotTable.versions(spark, dir).max == v1)
    // replaying an already-folded batch rewrites an EQUAL assignment
    IncrementalClusters.foldPairs(spark, dir, Seq((1L, 2L)).toDF("id_a", "id_b"))
    assert(assignment(dir) == a1)
  }

  test("streamed corpus: foreachBatch fold equals the batch dedup pipeline's clusters") {
    // the full loop: docs stream in halves → stateful LSH candidates →
    // exact-verify each micro-batch → fold into the clusters table; the
    // final assignment must equal connectedComponents over the BATCH
    // pipeline's verified pairs for the whole corpus
    def words(seed: Long, len: Int): String = {
      val r = new scala.util.Random(seed)
      Seq.fill(len)("tok" + r.nextInt(500)).mkString(" ")
    }
    val base = (0 until 18).map(i => (i.toLong, words(i * 7L + 1, 30)))
    val twins = (0 until 18 by 3).map(i => ((1000 + i).toLong, base(i)._2 + " extra" + i))
    // a cross-batch chain: 2000 twins base(2), 2001 twins 2000 — their
    // cluster only forms transitively
    val chain = Seq((2000L, base(2)._2 + " tail"), (2001L, base(2)._2 + " tail x"))
    val docs = base ++ twins ++ chain
    val all = docs.toDF("doc_id", "text")

    val dir = tmp("stream")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupCandidates(mem.toDF.toDF("doc_id", "text"), threshold = 0.0)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingDedup.CandidatePair], id: Long) =>
        // exact-verify the micro-batch's candidates before folding — the
        // same composition q150 gates in batch mode
        val verified = Dedup.verifyPairsExactJaccard(
          all, batch.toDF().select(col("id_a"), col("id_b")), threshold = 0.5)
        IncrementalClusters.foldPairs(spark, dir, verified)
        ()
      }
      .start()
    try {
      val (b1, b2) = docs.partition(_._1 % 2 == 0)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val wantPairs = Dedup.minHashVerifiedNearDups(all, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val want = Graph.connectedComponents(wantPairs)
      .as[(Long, Long)].collect().toMap
    assert(want.nonEmpty)
    assert(assignment(dir) == want)
  }
}
