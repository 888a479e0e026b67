package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.catalog.SnapshotTable
import graft.dedup.Dedup

/** Cross-corpus dedup on ingest: the prepared-reference sweep must emit
  * exactly the one-shot operator's pairs, and the `foreachBatch` sink must
  * land exactly the batch pipeline's kept set — streamed in any batching,
  * exactly-once under replay with an appId.
  */
class StreamingCrossDedupSpec extends SparkSpec {
  import spark.implicits._

  private val longA = "the quick brown fox jumps over the lazy dog while the cat " +
    "sleeps near the warm fire and the rain falls softly on the old roof tonight"
  private val longB = "databases keep their promises by writing a log before the " +
    "page and replaying it after a crash so committed work is never lost at all"

  private val reference = Seq((1L, longA), (2L, longB)).toDF("doc_id", "text")

  private val fresh = Seq(
    (100L, longA + " zz"), // near-dup of ref 1
    (101L, "a genuinely new document about sailing boats across the northern " +
      "sea under a grey sky with strong winds and heavy waves all day long"),
    (102L, longB + " yy"), // near-dup of ref 2
    (103L, "another clean arrival describing mountain trails and quiet lakes " +
      "far away from any text the curated corpus has ever seen before now"),
    (104L, "too short") // < shingleK tokens: no signature, passes through
  ).toDF("doc_id", "text")

  test("crossNearDupsPrepared emits exactly the one-shot operator's pairs") {
    val prep = Dedup.crossPrepare(reference)
    try {
      val prepared = Dedup.crossNearDupsPrepared(fresh, prep).orderBy($"new_id", $"ref_id")
      val oneShot = Dedup.crossNearDups(fresh, reference).orderBy($"new_id", $"ref_id")
      assert(prepared.collect().toSeq == oneShot.collect().toSeq)
      assert(prepared.select($"new_id", $"ref_id").as[(Long, Long)].collect().toSet
        == Set((100L, 1L), (102L, 2L)))
    } finally prep.release()
  }

  test("crossSink lands exactly removeCrossDups' kept set, streamed in halves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scross").toString + "/t"
    val prep = Dedup.crossPrepare(reference)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        Dedup.crossSink(prep, dir)(b.toDF(), id)
      }
      .start()
    try {
      val rows = fresh.as[(Long, String)].collect().toSeq
      val (b1, b2) = rows.partition(_._1 <= 101)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val landed = SnapshotTable.read(spark, dir)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      val batchKept = Dedup.removeCrossDups(fresh, reference)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(landed == batchKept)
      assert(landed == Seq(101L, 103L, 104L), s"got $landed")
    } finally {
      q.stop()
      prep.release()
    }
  }

  test("prepared reference joins exchange-free: cached HashPartitioning is reused") {
    // crossPrepare persists `banded` pre-partitioned on (band, band_hash)
    // and `sets` on ref_id, so every sweep's joins read the corpus-scale
    // reference side WITHOUT re-shuffling it — only the arriving batch
    // exchanges. Pin the mechanism: with broadcast off, a join against
    // each cached view must plan no ShuffleExchange above its cache scan.
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // executed / collectAll come from SparkSpec
    def refSideShuffles(df: org.apache.spark.sql.DataFrame): Seq[ShuffleExchangeExec] = {
      val plan = executed(df)
      val cacheScans = collectAll(plan) { case m: InMemoryTableScanExec => m }
      assert(cacheScans.nonEmpty, s"expected a cache scan in\n$plan")
      collectAll(plan) { case s: ShuffleExchangeExec
        if collectAll(s.child) { case m: InMemoryTableScanExec => m }.nonEmpty => s }
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val prep = Dedup.crossPrepare(reference)
    try {
      val bandProbe = Seq((0, 1L), (1, 2L)).toDF("band", "band_hash")
      assert(refSideShuffles(bandProbe.join(prep.banded, Seq("band", "band_hash"))).isEmpty,
        "banded reference re-shuffled on a sweep join")
      val idProbe = Seq(1L, 2L).toDF("ref_id")
      assert(refSideShuffles(idProbe.join(prep.sets, Seq("ref_id"))).isEmpty,
        "reference shingle sets re-shuffled on a verification join")
    } finally {
      prep.release()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("an all-dup batch publishes NO table version") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scross2").toString + "/t"
    val prep = Dedup.crossPrepare(reference)
    try {
      val sink = Dedup.crossSink(prep, dir)
      sink(fresh.filter($"doc_id" === 101), 0L) // clean → version 0
      val v0 = SnapshotTable.versions(spark, dir).max
      sink(fresh.filter($"doc_id" === 100), 1L) // dup of ref 1 → dropped whole
      assert(SnapshotTable.versions(spark, dir).max == v0)
      sink(fresh.filter($"doc_id" === 103), 2L) // clean again → new version
      assert(SnapshotTable.versions(spark, dir).max > v0)
      val landed = SnapshotTable.read(spark, dir).select($"doc_id").as[Long].collect().sorted
      assert(landed.toSeq == Seq(101L, 103L))
    } finally prep.release()
  }

  test("appId crossSink: a crash-replayed batch appends NOTHING (exactly-once)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scross3").toString + "/t"
    val prep = Dedup.crossPrepare(reference)
    try {
      val sink = Dedup.crossSink(prep, dir, appId = Some("cross-eo"))
      sink(fresh.filter($"doc_id" <= 101), 0L)
      val v0 = SnapshotTable.versions(spark, dir).max
      val rows0 = SnapshotTable.read(spark, dir).select($"doc_id").as[Long].collect().sorted.toSeq
      assert(rows0 == Seq(101L)) // 100 is a dup of ref 1
      // forced re-delivery of the SAME batch: no duplicate rows, no version
      sink(fresh.filter($"doc_id" <= 101), 0L)
      assert(SnapshotTable.versions(spark, dir).max == v0)
      assert(SnapshotTable.read(spark, dir).select($"doc_id")
        .as[Long].collect().sorted.toSeq == rows0)
      // the NEXT batch still lands; replaying it afterwards is a no-op too
      sink(fresh.filter($"doc_id" > 101), 1L)
      val all = SnapshotTable.read(spark, dir).select($"doc_id").as[Long].collect().sorted.toSeq
      assert(all == Seq(101L, 103L, 104L), s"got $all")
      sink(fresh.filter($"doc_id" > 101), 1L)
      assert(SnapshotTable.read(spark, dir).count() == 3)
    } finally prep.release()
  }

  // ---------------------------------------------- table-backed reference

  /** The session confs the table-backed sweep's exchange-free plan shape
    * needs (Sessions.local sets them from session start; the shared TEST
    * session leaves them default-off so other suites' shuffle assertions
    * see stock planning).
    */
  private val SpjConfs = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true")

  /** Shuffles sitting ABOVE a snapshot-table scan in `df`'s executed plan
    * — the reference side re-exchanging. The probe side's own shuffle
    * into the bucket domain has no scan beneath it and doesn't count.
    */
  private def snapSideShuffles(df: org.apache.spark.sql.DataFrame): Seq[Any] = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(df)
    assert(collectAll(plan) { case b: BatchScanExec => b }.nonEmpty,
      s"expected a snapshot BatchScan in\n$plan")
    collectAll(plan) { case s: ShuffleExchangeExec
      if collectAll(s.child) { case b: BatchScanExec => b }.nonEmpty => s }
  }

  test("table-backed prepared reference: sweep equals crossNearDups; the " +
    "bucketed layout joins exchange-free on the reference side") {
    withConf(SpjConfs: _*) {
      val dir = java.nio.file.Files.createTempDirectory("graft-scrosst").toString + "/ref"
      Dedup.crossPrepareTable(reference, dir, buckets = 4)
      val prep = Dedup.crossPreparedFromTable(spark, dir)
      val swept = Dedup.crossNearDupsPrepared(fresh, prep).orderBy($"new_id", $"ref_id")
      val oneShot = Dedup.crossNearDups(fresh, reference).orderBy($"new_id", $"ref_id")
      assert(swept.collect().toSeq == oneShot.collect().toSeq)
      // with broadcast off, a join against each table view must plan NO
      // exchange above the snapshot scan: the scan reports its
      // KeyGroupedPartitioning and only the probe side shuffles into the
      // bucket domain (the BucketPartitionSpec one-sided-shuffle mechanism)
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val bandProbe = Seq((0, 1L), (1, 2L)).toDF("band", "band_hash")
        assert(snapSideShuffles(bandProbe.join(prep.banded, Seq("band", "band_hash"))).isEmpty,
          "table-backed banded reference re-shuffled on a sweep join")
        val idProbe = Seq(1L, 2L).toDF("ref_id")
        assert(snapSideShuffles(idProbe.join(prep.sets, Seq("ref_id"))).isEmpty,
          "table-backed shingle sets re-shuffled on a verification join")
      }
    }
  }

  test("crossPrepareAppend grows the reference incrementally: sweep equals " +
    "a from-scratch prepare over the grown corpus") {
    withConf(SpjConfs: _*) {
      val dir = java.nio.file.Files.createTempDirectory("graft-scrossg").toString + "/ref"
      Dedup.crossPrepareTable(reference.filter($"doc_id" === 1L), dir, buckets = 4)
      // doc 102 (near-dup of ref 2) is CLEAN against the doc-1-only reference
      val prep0 = Dedup.crossPreparedFromTable(spark, dir)
      assert(Dedup.crossNearDupsPrepared(fresh, prep0)
        .select($"new_id", $"ref_id").as[(Long, Long)].collect().toSet == Set((100L, 1L)))
      Dedup.crossPrepareAppend(reference.filter($"doc_id" === 2L), dir)
      val prep1 = Dedup.crossPreparedFromTable(spark, dir)
      val grown = Dedup.crossNearDupsPrepared(fresh, prep1).orderBy($"new_id", $"ref_id")
      val scratch = Dedup.crossNearDups(fresh, reference).orderBy($"new_id", $"ref_id")
      assert(grown.collect().toSeq == scratch.collect().toSeq)
    }
  }

  test("prepared views are VERSION-pinned: an append landing mid-sweep changes " +
    "nothing until reload") {
    withConf(SpjConfs: _*) {
      val dir = java.nio.file.Files.createTempDirectory("graft-scrossp").toString + "/ref"
      Dedup.crossPrepareTable(reference.filter($"doc_id" === 1L), dir, buckets = 4)
      val prep = Dedup.crossPreparedFromTable(spark, dir)
      def pairsVia(p: Dedup.PreparedReference): Set[(Long, Long)] =
        Dedup.crossNearDupsPrepared(fresh, p)
          .select($"new_id", $"ref_id").as[(Long, Long)].collect().toSet
      assert(pairsVia(prep) == Set((100L, 1L)))
      // a concurrent (here: interleaved) append must NOT change what the
      // already-loaded handle judges against — a current-version view
      // would re-resolve per execution and could tear banded newer than
      // sets mid-sweep, silently dropping true pairs
      Dedup.crossPrepareAppend(reference.filter($"doc_id" === 2L), dir)
      assert(pairsVia(prep) == Set((100L, 1L)),
        "pinned sweep must be unchanged by a mid-sweep append")
      // reloading observes the grown generation
      assert(pairsVia(Dedup.crossPreparedFromTable(spark, dir))
        == Set((100L, 1L), (102L, 2L)))
    }
  }

  test("appId crossPrepareAppend: a crash between the two commits heals to exactly " +
    "the single-shot state — zero duplicate sets rows; full replay is a no-op") {
    withConf(SpjConfs: _*) {
      val base = java.nio.file.Files.createTempDirectory("graft-scrossh").toString
      Dedup.crossPrepareTable(reference.filter($"doc_id" === 1L), s"$base/ref", buckets = 4)
      // simulate the crash state "sets committed with the marker, banded
      // not": a scratch prepare over the SAME params yields bit-identical
      // rows (signatures are deterministic in (k, bands, seed, shingleK)),
      // so appending its sets rows under the marker reproduces exactly the
      // state a crash between crossPrepareAppend's two commits leaves
      Dedup.crossPrepareTable(reference.filter($"doc_id" === 2L), s"$base/scratch", buckets = 4)
      SnapshotTable.appendExactlyOnce(spark,
        SnapshotTable.read(spark, s"$base/scratch/sets"), s"$base/ref/sets", "xpa", 7L)
      // the heal: the shared marker makes the sets append a no-op and
      // lands only the missing banded half
      Dedup.crossPrepareAppend(reference.filter($"doc_id" === 2L), s"$base/ref",
        appId = Some("xpa"), batchId = 7L)
      val sets = SnapshotTable.read(spark, s"$base/ref/sets")
      assert(sets.count() == sets.select($"ref_id").distinct().count(),
        "crash-heal must leave zero duplicate sets rows")
      // both tables now equal the single-shot prepare over the full corpus
      Dedup.crossPrepareTable(reference, s"$base/full", buckets = 4)
      def setsOf(d: String) = SnapshotTable.read(spark, s"$d/sets")
        .select($"ref_id", $"n").as[(Long, Int)].collect().toSet
      def bandedOf(d: String) = SnapshotTable.read(spark, s"$d/banded")
        .select($"band", $"band_hash", $"ref_id").as[(Int, Long, Long)].collect().toSet
      assert(setsOf(s"$base/ref") == setsOf(s"$base/full"))
      assert(bandedOf(s"$base/ref") == bandedOf(s"$base/full"))
      // a full replay of the healed batch is a structural no-op
      val (vS, vB) = (SnapshotTable.versions(spark, s"$base/ref/sets").max,
        SnapshotTable.versions(spark, s"$base/ref/banded").max)
      Dedup.crossPrepareAppend(reference.filter($"doc_id" === 2L), s"$base/ref",
        appId = Some("xpa"), batchId = 7L)
      assert(SnapshotTable.versions(spark, s"$base/ref/sets").max == vS)
      assert(SnapshotTable.versions(spark, s"$base/ref/banded").max == vB)
      // and the grown sweep equals the from-scratch operator
      val prep = Dedup.crossPreparedFromTable(spark, s"$base/ref")
      assert(Dedup.crossNearDupsPrepared(fresh, prep).orderBy($"new_id", $"ref_id")
        .collect().toSeq
        == Dedup.crossNearDups(fresh, reference).orderBy($"new_id", $"ref_id")
        .collect().toSeq)
    }
  }

  test("no-appId crash-heal leaves duplicate sets rows, but sweeps still emit " +
    "each pair exactly once") {
    withConf(SpjConfs: _*) {
      val base = java.nio.file.Files.createTempDirectory("graft-scrossd").toString
      Dedup.crossPrepareTable(reference.filter($"doc_id" === 1L), s"$base/ref", buckets = 4)
      // crash state without a marker, then the documented heal (re-run):
      // sets now carries doc 2 TWICE
      Dedup.crossPrepareTable(reference.filter($"doc_id" === 2L), s"$base/scratch", buckets = 4)
      SnapshotTable.append(spark,
        SnapshotTable.read(spark, s"$base/scratch/sets"), s"$base/ref/sets")
      Dedup.crossPrepareAppend(reference.filter($"doc_id" === 2L), s"$base/ref")
      val sets = SnapshotTable.read(spark, s"$base/ref/sets")
      assert(sets.filter($"ref_id" === 2L).count() == 2, "fixture: duplicate sets rows")
      // the verified pairs dedupe, so pair consumers never see double-emits
      val prep = Dedup.crossPreparedFromTable(spark, s"$base/ref")
      val pairs = Dedup.crossNearDupsPrepared(fresh, prep)
        .select($"new_id", $"ref_id").as[(Long, Long)].collect().toSeq
      assert(pairs.size == pairs.distinct.size, s"duplicate pairs emitted: $pairs")
      assert(pairs.toSet == Set((100L, 1L), (102L, 2L)))
    }
  }

  test("crossMaintain compacts the append-fragmented reference; sweep results and " +
    "the exchange-free geometry survive") {
    withConf(SpjConfs: _*) {
      val dir = java.nio.file.Files.createTempDirectory("graft-scrossm").toString + "/ref"
      // small signature scheme so the partition count stays readable
      Dedup.crossPrepareTable(reference, dir, k = 8, bands = 4, buckets = 2)
      Dedup.crossPrepareAppend(fresh.filter($"doc_id" === 101L), dir)
      Dedup.crossPrepareAppend(fresh.filter($"doc_id" === 103L), dir)
      def files(t: String): Int =
        SnapshotTable.currentManifest(spark, s"$dir/$t").get.entries.length
      val (setsBefore, bandedBefore) = (files("sets"), files("banded"))
      Dedup.crossMaintain(spark, dir)
      assert(files("sets") < setsBefore,
        s"sets must compact: ${files("sets")} vs $setsBefore")
      assert(files("banded") < bandedBefore,
        s"banded must compact: ${files("banded")} vs $bandedBefore")
      // the compacted reference still sweeps identically to from-scratch
      val grown = reference.unionByName(
        fresh.filter($"doc_id".isin(101L, 103L)))
      val prep = Dedup.crossPreparedFromTable(spark, dir)
      assert(Dedup.crossNearDupsPrepared(fresh, prep).orderBy($"new_id", $"ref_id")
        .collect().toSeq
        == Dedup.crossNearDups(fresh, grown, k = 8, bands = 4)
        .orderBy($"new_id", $"ref_id").collect().toSeq)
      // and the rewrite preserved the bucket routing: reference-side scans
      // still join exchange-free
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val bandProbe = Seq((0, 1L), (1, 2L)).toDF("band", "band_hash")
        assert(snapSideShuffles(bandProbe.join(prep.banded, Seq("band", "band_hash"))).isEmpty,
          "compacted banded reference re-shuffled on a sweep join")
        val idProbe = Seq(1L, 2L).toDF("ref_id")
        assert(snapSideShuffles(idProbe.join(prep.sets, Seq("ref_id"))).isEmpty,
          "compacted shingle sets re-shuffled on a verification join")
      }
    }
  }

  test("crossSink over a table-backed reference stays exactly-once under replay") {
    withConf(SpjConfs: _*) {
      val base = java.nio.file.Files.createTempDirectory("graft-scrosseo").toString
      Dedup.crossPrepareTable(reference, s"$base/ref", buckets = 4)
      val prep = Dedup.crossPreparedFromTable(spark, s"$base/ref")
      val dir = s"$base/t"
      val sink = Dedup.crossSink(prep, dir, appId = Some("cross-tbl-eo"))
      sink(fresh.filter($"doc_id" <= 101), 0L)
      val v0 = SnapshotTable.versions(spark, dir).max
      assert(SnapshotTable.read(spark, dir).select($"doc_id")
        .as[Long].collect().sorted.toSeq == Seq(101L))
      sink(fresh.filter($"doc_id" <= 101), 0L) // forced re-delivery
      assert(SnapshotTable.versions(spark, dir).max == v0)
      sink(fresh.filter($"doc_id" > 101), 1L)
      val all = SnapshotTable.read(spark, dir).select($"doc_id").as[Long].collect().sorted.toSeq
      assert(all == Seq(101L, 103L, 104L), s"got $all")
      sink(fresh.filter($"doc_id" > 101), 1L)
      assert(SnapshotTable.read(spark, dir).count() == 3)
    }
  }
}
