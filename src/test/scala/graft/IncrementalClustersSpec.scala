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

  test("foldDelta: one-collect driver path equals the distributed fallback (r21)") {
    // prev assignment: {1,2} rep 1, {5,6} rep 5, singleton 9
    val prev = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("doc_id", "rep_id")
    // batch: merges the two clusters through new doc 100, brings a fresh
    // pair (200, 201), re-links 9 to itself (self-loop no-op), and repeats
    // an endpoint so the new-doc dedupe is exercised
    val batch = Seq((2L, 100L), (100L, 6L), (200L, 201L), (9L, 9L), (100L, 100L))
      .toDF("id_a", "id_b")
    def sets(d: IncrementalClusters.FoldDelta) = (
      d.remap.as[(Long, Long)].collect().toSet,
      d.newDocs.as[(Long, Long)].collect().toSet)
    val (remapD, newD) = sets(IncrementalClusters.foldDelta(batch, prev))
    // driverMax = 0 forces the pre-r21 distributed shape — same algebra,
    // different machinery; the two paths must agree row-for-row
    val (remapF, newF) = sets(IncrementalClusters.foldDelta(batch, prev, driverMax = 0))
    assert(remapD == remapF, s"driver $remapD vs fallback $remapF")
    assert(newD == newF, s"driver $newD vs fallback $newF")
    // and both must be the expected delta: cluster 5 absorbs into 1
    // (min id); the contracted new-doc nodes carry their own remap rows
    // (inert downstream — new ids never match prev's rep_id), and the new
    // docs take the merged component's rep
    assert(remapD == Set((5L, 1L), (100L, 1L), (201L, 200L)))
    assert(newD == Set((100L, 1L), (200L, 200L), (201L, 200L)))
  }

  test("empty batch is a no-op version-wise; replayed batch is idempotent") {
    val dir = tmp("idem")
    IncrementalClusters.foldPairs(spark, dir, Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"))
    val v1 = SnapshotTable.versions(spark, dir).max
    val a1 = assignment(dir)
    // empty fold: no new snapshot version
    IncrementalClusters.foldPairs(spark, dir, Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(SnapshotTable.versions(spark, dir).max == v1)
    // replaying an already-folded batch changes NOTHING — not even a
    // version (the contracted pairs are all self-loops, the merge delta
    // is empty, no snapshot publishes)
    IncrementalClusters.foldPairs(spark, dir, Seq((1L, 2L)).toDF("id_a", "id_b"))
    assert(assignment(dir) == a1)
    assert(SnapshotTable.versions(spark, dir).max == v1)
  }

  test("a fold rewrites ONLY data files containing touched docs") {
    // the O(Δ) I/O contract: the assignment snapshot's untouched files
    // must move to the post-fold version BY REFERENCE, never by rewrite —
    // at a corpus-scale assignment this is the difference between a
    // micro-batch costing O(batch) and O(corpus)
    val dir = tmp("io")
    // three disjoint doc_id ranges, one file each (singleton clusters)
    SnapshotTable.write(spark,
      (0L until 100L).map(i => (i, i)).toDF("doc_id", "rep_id").repartition(1), dir)
    SnapshotTable.append(spark,
      (1000L until 1100L).map(i => (i, i)).toDF("doc_id", "rep_id").repartition(1), dir)
    SnapshotTable.append(spark,
      (2000L until 2100L).map(i => (i, i)).toDF("doc_id", "rep_id").repartition(1), dir)
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.size == 3)
    val untouched = m.entries.filter(e =>
      e.stats.get("doc_id").hi.get.toDouble < 1000.0 ||
        e.stats.get("doc_id").lo.get.toDouble >= 2000.0).map(_.path).toSet
    assert(untouched.size == 2)
    // merge two singletons in the middle range: touched docs = {1051}
    // (1050 is the new rep and keeps its row), plus no new docs
    IncrementalClusters.foldPairs(spark, dir, Seq((1050L, 1051L)).toDF("id_a", "id_b"))
    val after = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    assert(untouched.subsetOf(after),
      s"untouched files were rewritten: ${untouched -- after}")
    assert(assignment(dir).view.filterKeys(k => k == 1050L || k == 1051L).toMap ==
      Map(1050L -> 1050L, 1051L -> 1050L))
    assert(IncrementalClusters.clusters(spark, dir).count() == 300)
  }

  test("maintain range-clusters by doc_id: post-maintenance folds rewrite the minimum file set") {
    val dir = tmp("maint")
    // hash-layout start: 4 files, EVERY file spans the whole doc_id range,
    // so any fold's key footprint overlaps all of them
    SnapshotTable.write(spark,
      (0L until 20000L).map(i => (i, i)).toDF("doc_id", "rep_id").repartition(4), dir)
    val m0 = SnapshotTable.currentManifest(spark, dir).get
    assert(m0.entries.size >= 4)
    IncrementalClusters.foldPairs(spark, dir, Seq((100L, 101L)).toDF("id_a", "id_b"))
    val afterBlind = SnapshotTable.currentManifest(spark, dir).get
    val blindRewrites = m0.entries.map(_.path).toSet -- afterBlind.entries.map(_.path).toSet
    assert(blindRewrites.size >= 4, s"hash layout should overlap everywhere: $blindRewrites")
    // range-cluster, then the same-shape fold must touch exactly ONE file
    val (_, nAfter) = IncrementalClusters.maintain(spark, dir, targetBytes = 32 * 1024)
    assert(nAfter >= 3, s"need several clustered files to prove pruning, got $nAfter")
    val m1 = SnapshotTable.currentManifest(spark, dir).get
    IncrementalClusters.foldPairs(spark, dir, Seq((200L, 201L)).toDF("id_a", "id_b"))
    val m2 = SnapshotTable.currentManifest(spark, dir).get
    val rewrites = m1.entries.map(_.path).toSet -- m2.entries.map(_.path).toSet
    assert(rewrites.size == 1, s"clustered fold rewrote ${rewrites.size} files: $rewrites")
    assert(assignment(dir).view.filterKeys(k => k >= 100L && k <= 201L).toMap ==
      ((100L to 201L).map(i => i -> i).toMap ++ Map(101L -> 100L, 201L -> 200L)))
  }

  test("foldPairsScored: reps table equals the batch argmax after every fold") {
    val cdir = tmp("scored-c"); val rdir = tmp("scored-r")
    // deterministic quality signal; ties exercised via duplicate scores
    def score(id: Long): Double = ((id * 37) % 7).toDouble
    val batches = Seq(
      Seq((1L, 2L), (10L, 11L)),
      Seq((3L, 4L), (10L, 12L)),
      Seq((2L, 3L)),             // merges {1,2} and {3,4}
      Seq((20L, 21L), (1L, 4L))) // redundant edge inside a component
    val sofar = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    batches.foreach { b =>
      sofar ++= b
      val ids = b.flatMap(p => Seq(p._1, p._2)).distinct
      val scores = ids.map(id => (id, score(id))).toDF("doc_id", "score")
      IncrementalClusters.foldPairsScored(spark, cdir, rdir, b.toDF("id_a", "id_b"), scores)
      // batch truth: argmax (score, -id) per component over ALL docs so far
      val allIds = sofar.flatMap(p => Seq(p._1, p._2)).distinct.toSeq
      val cc = Graph.connectedComponents(sofar.toSeq.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      val want = allIds.groupBy(cc).map { case (rep, members) =>
        val best = members.map(id => (score(id), -id, id)).max
        (rep, (best._3, best._1))
      }
      val got = IncrementalClusters.reps(spark, rdir)
        .as[(Long, Long, Double)].collect().map(r => (r._1, (r._2, r._3))).toMap
      assert(got == want, s"reps diverged after batch $b")
      assert(assignment(cdir) == cc)
    }
    // replayed batch: no version churn, reps unchanged
    val v = SnapshotTable.versions(spark, cdir).max
    val repsBefore = IncrementalClusters.reps(spark, rdir)
      .as[(Long, Long, Double)].collect().toSet
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      Seq((1L, 2L)).toDF("id_a", "id_b"), Seq((1L, score(1L))).toDF("doc_id", "score"))
    assert(SnapshotTable.versions(spark, cdir).max == v)
    assert(IncrementalClusters.reps(spark, rdir)
      .as[(Long, Long, Double)].collect().toSet == repsBefore)
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

  test("MoR folds auto-maintain on the DV-ratio trigger: vectors purge, ratio stays bounded") {
    val dir = tmp("automaint")
    SnapshotTable.write(spark,
      (0L until 4000L).map(i => (i, i)).toDF("doc_id", "rep_id").repartition(2), dir)
    val thr = 0.004
    var maxRatio = 0.0
    var maintains = 0
    (0 until 12).foreach { k =>
      val pairs = (0 until 4).map { j => val p = (k * 4 + j).toLong; (2 * p, 2 * p + 1) }
        .toDF("id_a", "id_b")
      val vBefore = SnapshotTable.versions(spark, dir).max
      IncrementalClusters.foldPairs(spark, dir, pairs, mor = true,
        maintainAboveDvRatio = Some(thr))
      if (SnapshotTable.versions(spark, dir).max > vBefore + 1) maintains += 1
      maxRatio = math.max(maxRatio, IncrementalClusters.dvRatio(spark, dir))
    }
    // each fold vectors 4 rows of ~4000 physical; the trigger fires every
    // ~4 folds, so the POST-FOLD ratio never exceeds the threshold
    assert(maxRatio <= thr, f"post-fold DV ratio $maxRatio%.5f above trigger $thr")
    assert(maintains >= 2, s"auto-maintain fired only $maintains times in 12 folds")
    val got = assignment(dir)
    (0 until 48).foreach { p => assert(got(2L * p + 1) == 2L * p) }
    assert(got.size == 4000)
  }

  // ---- txn-marker crash recovery (the two-table fold's exactly-once) ----

  private def score(id: Long): Double = ((id * 37) % 7).toDouble
  private def scoresOf(b: Seq[(Long, Long)]) =
    b.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => (id, score(id))).toDF("doc_id", "score")
  private def reps(rdir: String): Map[Long, (Long, Double)] =
    IncrementalClusters.reps(spark, rdir)
      .as[(Long, Long, Double)].collect().map(r => (r._1, (r._2, r._3))).toMap
  private def repsTruth(edges: Seq[(Long, Long)]): Map[Long, (Long, Double)] = {
    val cc = Graph.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    edges.flatMap(p => Seq(p._1, p._2)).distinct.groupBy(cc).map {
      case (rep, members) =>
        val best = members.map(id => (score(id), -id, id)).max
        (rep, (best._3, best._1))
    }
  }

  test("txn fold: kill between the two commits, re-deliver, reps heal to the batch argmax") {
    val cdir = tmp("txn-c"); val rdir = tmp("txn-r")
    val b0 = Seq((1L, 2L), (10L, 11L))
    val b1 = Seq((2L, 10L), (20L, 21L)) // merges {1,2}+{10,11}, adds {20,21}
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b0.toDF("id_a", "id_b"), scoresOf(b0), txn = Some(("app", 0L)))
    assert(reps(rdir) == repsTruth(b0))
    // crash AFTER batch 1's assignment commit, before any reps work
    IncrementalClusters.crashSeams.add("afterAssignmentCommit")
    try intercept[IllegalStateException] {
      IncrementalClusters.foldPairsScored(spark, cdir, rdir,
        b1.toDF("id_a", "id_b"), scoresOf(b1), txn = Some(("app", 1L)))
    } finally IncrementalClusters.crashSeams.remove("afterAssignmentCommit")
    // half-applied: assignment carries batch 1, reps still at batch 0
    assert(SnapshotTable.lastTxn(spark, cdir, "app#assign").contains(1L))
    assert(!SnapshotTable.lastTxn(spark, rdir, "app#reps").exists(_ >= 1L))
    assert(reps(rdir) == repsTruth(b0), "reps should be one fold behind, not corrupt")
    // re-delivery repairs the reps leg from the assignment's history
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b1.toDF("id_a", "id_b"), scoresOf(b1), txn = Some(("app", 1L)))
    assert(reps(rdir) == repsTruth(b0 ++ b1))
    assert(assignment(cdir) == Graph.connectedComponents((b0 ++ b1).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap)
    // further replays (same or older batch) churn NOTHING on either table
    val (vc, vr) = (SnapshotTable.versions(spark, cdir).max, SnapshotTable.versions(spark, rdir).max)
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b1.toDF("id_a", "id_b"), scoresOf(b1), txn = Some(("app", 1L)))
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b0.toDF("id_a", "id_b"), scoresOf(b0), txn = Some(("app", 0L)))
    assert(SnapshotTable.versions(spark, cdir).max == vc)
    assert(SnapshotTable.versions(spark, rdir).max == vr)
  }

  test("reps leg is ONE commit: stale-rep delete rides the merge (no strandable window)") {
    val cdir = tmp("txn2-c"); val rdir = tmp("txn2-r")
    val b0 = Seq((1L, 2L), (10L, 11L))
    val b1 = Seq((2L, 10L)) // merges the clusters -> rep 10's row must go
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b0.toDF("id_a", "id_b"), scoresOf(b0), txn = Some(("app2", 0L)))
    val vr0 = SnapshotTable.versions(spark, rdir).max
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b1.toDF("id_a", "id_b"), scoresOf(b1), txn = Some(("app2", 1L)))
    // exactly ONE reps version for the fold — upsert AND stale delete
    assert(SnapshotTable.versions(spark, rdir).max == vr0 + 1,
      "the reps merge and the stale-rep delete must share one commit")
    assert(reps(rdir) == repsTruth(b0 ++ b1))
    assert(!reps(rdir).contains(10L), "absorbed cluster's rep row must be gone")
  }

  test("scoredSink: streamed batches fold exactly-once; direct re-delivery is a no-op") {
    val cdir = tmp("ssink-c"); val rdir = tmp("ssink-r")
    // batch frames carry pairs + per-doc scores side by side: pairs as
    // (id_a, id_b), scores recoverable via the deterministic score fn
    val sink = IncrementalClusters.scoredSink(cdir, rdir, appId = "ssink",
      scoresOf = b => {
        val ids = b.select(col("id_a").as("doc_id"))
          .unionByName(b.select(col("id_b").as("doc_id"))).distinct()
        ids.select(col("doc_id"), (pmod(col("doc_id") * 37, lit(7)).cast("double")).as("score"))
      })
    val b0 = Seq((1L, 2L), (10L, 11L))
    val b1 = Seq((2L, 10L), (20L, 21L))
    sink(b0.toDF("id_a", "id_b"), 0L)
    sink(b1.toDF("id_a", "id_b"), 1L)
    assert(reps(rdir) == repsTruth(b0 ++ b1))
    // crash-replay of both batches: no rows change, no versions publish
    val (vc, vr) = (SnapshotTable.versions(spark, cdir).max, SnapshotTable.versions(spark, rdir).max)
    sink(b0.toDF("id_a", "id_b"), 0L)
    sink(b1.toDF("id_a", "id_b"), 1L)
    assert(SnapshotTable.versions(spark, cdir).max == vc)
    assert(SnapshotTable.versions(spark, rdir).max == vr)
    assert(reps(rdir) == repsTruth(b0 ++ b1))
  }

  test("txn fold: create-fold crash (assignment written, reps missing) heals on re-delivery") {
    val cdir = tmp("txn3-c"); val rdir = tmp("txn3-r")
    val b0 = Seq((1L, 2L), (10L, 11L), (5L, 5L))
    IncrementalClusters.crashSeams.add("afterAssignmentCommit")
    try intercept[IllegalStateException] {
      IncrementalClusters.foldPairsScored(spark, cdir, rdir,
        b0.toDF("id_a", "id_b"), scoresOf(b0), txn = Some(("app3", 0L)))
    } finally IncrementalClusters.crashSeams.remove("afterAssignmentCommit")
    assert(SnapshotTable.exists(spark, cdir) && !SnapshotTable.exists(spark, rdir))
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b0.toDF("id_a", "id_b"), scoresOf(b0), txn = Some(("app3", 0L)))
    assert(reps(rdir) == repsTruth(b0))
    // non-txn folds on the healed tables keep working
    val b1 = Seq((2L, 10L))
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b1.toDF("id_a", "id_b"), scoresOf(b1))
    assert(reps(rdir) == repsTruth(b0 ++ b1))
  }

  test("EMPTY reps leg still records its marker: replay converges, never re-heals") {
    val cdir = tmp("txn4-c"); val rdir = tmp("txn4-r")
    val noScores = Seq.empty[(Long, Double)].toDF("doc_id", "score")
    val b0 = Seq((1L, 2L), (10L, 11L))
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b0.toDF("id_a", "id_b"), scoresOf(b0), txn = Some(("appE", 0L)))
    val vr0 = SnapshotTable.versions(spark, rdir).max
    // batch 1: a self-loop on a brand-new SCORE-LESS doc — the one shape
    // that reaches the reps leg with zero argmax candidates AND zero stale
    // deletes (a scores-contract violation the leg tolerates): the
    // assignment gains the singleton, the reps leg is empty, and the
    // appE#reps marker must STILL record via the metadata-only commit
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      Seq((30L, 30L)).toDF("id_a", "id_b"), noScores, txn = Some(("appE", 1L)))
    assert(assignment(cdir)(30L) == 30L)
    assert(reps(rdir) == repsTruth(b0), "score-less singleton must not enter reps")
    assert(SnapshotTable.versions(spark, rdir).max == vr0 + 1,
      "the empty leg must publish exactly its marker-only commit")
    assert(SnapshotTable.lastTxn(spark, rdir, "appE#reps").contains(1L))
    // replay: BOTH markers present -> structural no-op, no heal, no churn
    val (vc, vr) = (SnapshotTable.versions(spark, cdir).max, SnapshotTable.versions(spark, rdir).max)
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      Seq((30L, 30L)).toDF("id_a", "id_b"), noScores, txn = Some(("appE", 1L)))
    assert(SnapshotTable.versions(spark, cdir).max == vc)
    assert(SnapshotTable.versions(spark, rdir).max == vr)
  }

  test("reps invariant violation (absorbed cluster, no candidates) refuses loudly, heals on corrected re-delivery") {
    val cdir = tmp("txn5-c"); val rdir = tmp("txn5-r")
    val noScores = Seq.empty[(Long, Double)].toDF("doc_id", "score")
    val b0 = Seq((1L, 2L), (10L, 11L))
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b0.toDF("id_a", "id_b"), scoresOf(b0), txn = Some(("appV", 0L)))
    // batch 1 links two brand-new docs but carries NO scores: the delta's
    // remap deletes "cluster 4" while zero argmax candidates exist — the
    // leg must surface the broken scores contract, not trip the merge's
    // opaque empty-batch refusal (and not silently strand the marker)
    val b1 = Seq((3L, 4L))
    val err = intercept[IllegalArgumentException] {
      IncrementalClusters.foldPairsScored(spark, cdir, rdir,
        b1.toDF("id_a", "id_b"), noScores, txn = Some(("appV", 1L)))
    }
    assert(err.getMessage.contains("reps invariant violated"))
    // the assignment leg committed before the refusal; a CORRECTED
    // re-delivery (scores present) repairs the reps leg through the
    // standard heal path
    assert(SnapshotTable.lastTxn(spark, cdir, "appV#assign").contains(1L))
    assert(!SnapshotTable.lastTxn(spark, rdir, "appV#reps").exists(_ >= 1L))
    IncrementalClusters.foldPairsScored(spark, cdir, rdir,
      b1.toDF("id_a", "id_b"), scoresOf(b1), txn = Some(("appV", 1L)))
    assert(reps(rdir) == repsTruth(b0 ++ b1))
    assert(SnapshotTable.lastTxn(spark, rdir, "appV#reps").contains(1L))
  }
}
