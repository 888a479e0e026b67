package graft

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotTable
import graft.dedup.{CrossSweep, Dedup, SemDeDup}

/** Composed inter-dump sweep (verbatim tier → survivors → semantic tier):
  * must equal the sequential composition of the one-shot filtering
  * operators exactly, and the ingest sink must land exactly that kept set
  * exactly-once.
  */
class CrossSweepSpec extends SparkSpec {
  import spark.implicits._

  private def unit(deg: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r), math.sin(r), 0.0, 0.0)
  }

  private val longA = "the quick brown fox jumps over the lazy dog while the cat " +
    "sleeps near the warm fire and the rain falls softly on the old roof tonight"
  private val longB = "databases keep their promises by writing a log before the " +
    "page and replaying it after a crash so committed work is never lost at all"

  private val centroids = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))

  private val reference = Seq(
    (1L, longA, unit(0)),
    (2L, longB, unit(90))
  ).toDF("doc_id", "text", "vec")

  private val fresh = Seq(
    // verbatim dup of ref 1; semantically clean (cell 1, cos vs ref2 = 0.94)
    (100L, longA + " zz", unit(70)),
    // verbatim-clean; semantic dup of ref 1 (cell 0, cos(5) = 0.996)
    (101L, "a genuinely new document about sailing boats across the northern " +
      "sea under a grey sky with strong winds and heavy waves all day long", unit(5)),
    // dup on BOTH tiers — must be killed once, by the cheap tier
    (102L, longB + " yy", unit(85)),
    // clean on both tiers
    (103L, "another clean arrival describing mountain trails and quiet lakes " +
      "far away from any text the curated corpus has ever seen before now", unit(44)),
    // too short to shingle (passes verbatim structurally); semantically clean
    (104L, "too short", unit(46))
  ).toDF("doc_id", "text", "vec")

  private val refVecs = reference.select($"doc_id".as("id"), $"vec")

  test("removeCrossAll equals the sequential one-shot composition; each tier kills its docs") {
    val vPrep = Dedup.crossPrepare(reference)
    val sPrep = SemDeDup.crossSemanticPrepare(refVecs, centroids)
    try {
      val composed = CrossSweep.removeCrossAll(fresh, vPrep, sPrep,
        jaccardThreshold = 0.5, cosThreshold = 0.95)
      val kept = composed.select($"doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(103L, 104L), s"got $kept")
      assert(composed.columns.toSeq == fresh.columns.toSeq) // column-preserving
      // sequential composition of the independent one-shot operators
      val afterVerbatim = Dedup.removeCrossDups(fresh, reference)
      val seqKept = SemDeDup.removeCrossSemanticDups(
          afterVerbatim.select($"doc_id".as("id"), $"vec"),
          refVecs, centroids, threshold = 0.95)
        .select($"id").as[Long].collect().sorted.toSeq
      assert(kept == seqKept)
    } finally { vPrep.release(); sPrep.release() }
  }

  test("removeCrossAll composes over TABLE-BACKED references identically") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true") {
      val base = java.nio.file.Files.createTempDirectory("graft-xall").toString
      Dedup.crossPrepareTable(reference, s"$base/v", buckets = 4)
      SemDeDup.crossSemanticPrepareTable(refVecs, centroids, s"$base/s", buckets = 4)
      val vPrep = Dedup.crossPreparedFromTable(spark, s"$base/v")
      val sPrep = SemDeDup.crossSemanticPreparedFromTable(spark, s"$base/s")
      val kept = CrossSweep.removeCrossAll(fresh, vPrep, sPrep,
        jaccardThreshold = 0.5, cosThreshold = 0.95)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(kept == Seq(103L, 104L), s"got $kept")
    }
  }

  test("crossAllSink lands exactly the composed kept set, streamed in halves, exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xallsink").toString + "/t"
    val vPrep = Dedup.crossPrepare(reference)
    val sPrep = SemDeDup.crossSemanticPrepare(refVecs, centroids)
    try {
      val sink = CrossSweep.crossAllSink(vPrep, sPrep, dir,
        jaccardThreshold = 0.5, cosThreshold = 0.95, appId = Some("xall-eo"))
      // batch 0 is ALL-DUP (100 verbatim, 101 semantic, 102 both): the
      // sink must publish nothing — not even the table
      sink(fresh.filter($"doc_id" <= 102), 0L)
      assert(!SnapshotTable.exists(spark, dir))
      sink(fresh.filter($"doc_id" > 102), 1L)
      val v1 = SnapshotTable.versions(spark, dir).max
      val landed = SnapshotTable.read(spark, dir).select($"doc_id").as[Long].collect().sorted.toSeq
      assert(landed == Seq(103L, 104L), s"got $landed")
      sink(fresh.filter($"doc_id" > 102), 1L) // forced re-delivery: no-op
      assert(SnapshotTable.versions(spark, dir).max == v1)
      assert(SnapshotTable.read(spark, dir).count() == 2)
      // a later all-dup batch publishes NO version either
      sink(fresh.filter($"doc_id" === 100L), 2L)
      assert(SnapshotTable.versions(spark, dir).max == v1)
    } finally { vPrep.release(); sPrep.release() }
  }

  test("end-to-end inter-dump lifecycle: sink dump 0, append BOTH tiers' " +
    "references, and dump 1 sees dump 0's survivors as duplicates") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true") {
      val base = java.nio.file.Files.createTempDirectory("graft-xlife").toString
      // the durable references start from the curated corpus
      Dedup.crossPrepareTable(reference, s"$base/v", buckets = 4)
      SemDeDup.crossSemanticPrepareTable(refVecs, centroids, s"$base/s", buckets = 4)
      val v0 = Dedup.crossPreparedFromTable(spark, s"$base/v")
      val s0 = SemDeDup.crossSemanticPreparedFromTable(spark, s"$base/s")
      // dump 0 sweeps in; survivors 103/104 land in the curated table
      CrossSweep.crossAllSink(v0, s0, s"$base/t",
        jaccardThreshold = 0.5, cosThreshold = 0.95,
        appId = Some("life-sink"))(fresh, 0L)
      val landed = SnapshotTable.read(spark, s"$base/t")
      assert(landed.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(103L, 104L))
      // the bookkeeping step: exactly the landed docs append to BOTH
      // tiers' references in ONE call — the production loop's post-sweep
      // commit
      CrossSweep.appendReferences(landed, s"$base/v", s"$base/s",
        appId = Some("life-ref"), batchId = 0L)
      // a crash-replayed bookkeeping step is a structural no-op on all
      // three underlying tables
      val refDirs = Seq(s"$base/v/sets", s"$base/v/banded", s"$base/s/cells")
      val vs = refDirs.map(d => SnapshotTable.versions(spark, d).max)
      CrossSweep.appendReferences(landed, s"$base/v", s"$base/s",
        appId = Some("life-ref"), batchId = 0L)
      assert(refDirs.map(d => SnapshotTable.versions(spark, d).max) == vs,
        "replayed bookkeeping must publish no versions")
      // dump 1: a verbatim near-copy of SURVIVOR 103, a semantic near-dup
      // of SURVIVOR 104 (cell 1, cos(1 deg)), and a genuinely new doc
      // (22 deg sits >= 18.2 deg from every cell-0 reference vector)
      val dump1 = Seq(
        (200L, "another clean arrival describing mountain trails and quiet lakes " +
          "far away from any text the curated corpus has ever seen before now qq",
          unit(20)),
        (201L, "completely different prose about deep sea creatures glowing in " +
          "the dark trenches of the pacific ocean floor at night", unit(47)),
        (202L, "finally a brand new article on gardening herbs in small city " +
          "apartments with limited sunlight through winter months", unit(22))
      ).toDF("doc_id", "text", "vec")
      // reload BOTH references: the v0/s0 handles are version-pinned and
      // predate the appends by design
      val v1 = Dedup.crossPreparedFromTable(spark, s"$base/v")
      val s1 = SemDeDup.crossSemanticPreparedFromTable(spark, s"$base/s")
      CrossSweep.crossAllSink(v1, s1, s"$base/t",
        jaccardThreshold = 0.5, cosThreshold = 0.95,
        appId = Some("life-sink"))(dump1, 1L)
      val all = SnapshotTable.read(spark, s"$base/t")
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(all == Seq(103L, 104L, 202L),
        s"dump 1 must lose 200 (verbatim ~ survivor 103) and 201 " +
          s"(semantic ~ survivor 104), got $all")
    }
  }
}
