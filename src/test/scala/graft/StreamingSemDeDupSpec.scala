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

  test("retention: emitted pairs equal the batch edge set restricted to the event-time window") {
    // arrival order puts each pert1 twin right after its base (Δts one
    // 100s step — inside the 250s window) and every pert2 doc at the END
    // (Δts far past retention → its pairs must drop); timestamps advance
    // monotonically so no pair straddles a watermark-evicted partner
    val rows0 = corpus.as[(Long, Seq[Double])].collect().toMap
    val baseIds = rows0.keys.filter(_ < 1000000L).toSeq.sorted
    val ordered = baseIds.flatMap(i =>
      Seq(i) ++ (if (rows0.contains(1000000L + i)) Seq(1000000L + i) else Nil)) ++
      rows0.keys.filter(_ >= 2000000L).toSeq.sorted
    val ts: Map[Long, Long] = ordered.zipWithIndex
      .map { case (id, i) => id -> (1700000000000L + i * 100000L) }.toMap
    val retention = java.time.Duration.ofMillis(250000L)
    val rows = ordered.map(id => (id, rows0(id), new java.sql.Timestamp(ts(id))))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
    val sinkTable = s"ssd_ttl_${System.nanoTime()}"
    val q = StreamingSemDeDup.semanticPairs(
        mem.toDF.toDF("id", "vec", "event_ts"), centroids, threshold = 0.99,
        retention = Some(retention))
      .writeStream.format("memory").queryName(sinkTable).outputMode("append").start()
    try {
      rows.grouped(120).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table(sinkTable)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val all = batchPairs(0.99).map(p => (p._1, p._2))
    val want = all.filter { case (a, b) => math.abs(ts(a) - ts(b)) <= retention.toMillis }
    val dropped = all -- want
    assert(want.nonEmpty && dropped.nonEmpty,
      s"fixture must keep some pairs in-window and push others out (${all.size} total)")
    assert(got == want, s"only-stream=${got -- want} only-batch=${want -- got}")

    // batch mode applies the same window rule (no watermark machinery)
    val batchGot = StreamingSemDeDup.semanticPairs(
        rows.toDF("id", "vec", "event_ts"), centroids, threshold = 0.99,
        retention = Some(retention))
      .collect().map(p => (p.id_a, p.id_b)).toSet
    assert(batchGot == want)
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

  test("centroid drift: occupancy alarm reads the query's own state; a re-fit restores balance") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = 16
    def axis(j: Int): Seq[Double] = Seq.tabulate(dim)(i => if (i == j) 1.0 else 0.0)
    // DRIFTED corpus: 8 sub-blobs s_j = 0.8*e0 + 0.6*e(8+j) (+ tiny seeded
    // noise), id i in sub-blob i%8. Against the ORIGINAL centroids (the
    // unit axes e0..e7) every doc scores 0.8 on e0 and ~0 elsewhere — the
    // whole stream lands in ONE cell
    val oldCents: Seq[Seq[Double]] = (0 until 8).map(axis)
    val docs: Seq[(Long, Seq[Double])] = (0 until 400).map { i =>
      val r = new scala.util.Random(i * 17L + 3)
      val j = i % 8
      (i.toLong, Seq.tabulate(dim)(d =>
        0.8 * (if (d == 0) 1.0 else 0.0) + 0.6 * (if (d == 8 + j) 1.0 else 0.0)
          + 0.01 * r.nextGaussian()))
    }
    def runAndMeasure(cents: Seq[Seq[Double]], tag: String): Double = {
      val ckpt = tmp(s"drift-$tag")
      val mem = MemoryStream[(Long, Seq[Double])]
      val q = StreamingSemDeDup.semanticPairs(
          mem.toDF.toDF("id", "vec"), cents, threshold = 0.999)
        .writeStream.format("memory").queryName(s"ssd_drift_$tag")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try { mem.addData(docs: _*); q.processAllAvailable() } finally q.stop()
      val occ = StreamingSemDeDup.cellOccupancy(spark, ckpt)
      // total retained over all live cells equals the corpus (cap not hit)
      assert(occ.agg(sum($"retained")).head().getLong(0) == docs.length.toLong)
      StreamingSemDeDup.occupancySkew(occ, cents.length)
    }
    val skewBefore = runAndMeasure(oldCents, "before")
    assert(skewBefore >= 4.0, f"drift alarm should fire: skew $skewBefore%.2f")
    // RE-FIT on the recent window (no state migration — a new query with
    // fresh centroids; its re-emitted pairs fold as no-ops downstream)
    val window = docs.toDF("id", "vec")
    val refit = Similarity.trainCentroids(window, dim, nlist = 8, iters = 2)
    val skewAfter = runAndMeasure(refit, "after")
    assert(skewAfter <= 2.0, f"re-fit should rebalance cells: skew $skewAfter%.2f")
  }
}
