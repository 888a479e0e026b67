package graft

import org.apache.spark.sql.functions._

import graft.dedup.SemDeDup

/** SemDeDup (q153): cluster-scoped semantic dedup — keep one representative
  * per within-cluster cosine-≥-threshold component.
  */
class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  private def unit(deg: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r), math.sin(r), 0.0, 0.0)
  }

  private val centroids = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))

  // angles from the x-axis; threshold 0.95 ~= 18.2 degrees
  private val corpus = Seq(
    (1L, unit(0)),   // cluster 0
    (2L, unit(10)),  // ~v1 (cos 0.985) and ~v3 (cos 0.985): the chain's middle
    (3L, unit(20)),  // ~v2 only (cos(20) = 0.94 < 0.95 vs v1) — transitive member
    (4L, unit(90)),  // cluster 1, no dup
    (5L, unit(44)),  // cluster 0 (44 < 45)
    (6L, unit(46))   // cluster 1 — cos(v5, v6) = cos(2 deg) but cells differ
  ).toDF("id", "vec")

  test("chain A~B~C with cos(A,C) below the cut is ONE component, rep = min id") {
    val got = SemDeDup.semanticDedup(corpus, centroids, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((0, 1L, true)))
    assert(got(2L) == ((0, 1L, false)))
    assert(got(3L) == ((0, 1L, false))) // in via the chain, not a direct pair
    assert(got(4L) == ((1, 4L, true)))
  }

  test("pairs straddling a cluster boundary are never compared (the SemDeDup trade)") {
    val got = SemDeDup.semanticDedup(corpus, centroids, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(3)))).toMap
    // cos(v5, v6) = cos(2 deg) = 0.9994 >= 0.95, but the cells differ: both kept
    assert(got(5L) == ((0, true)))
    assert(got(6L) == ((1, true)))
  }

  test("every corpus id appears exactly once; keep <=> id == rep_id") {
    val out = SemDeDup.semanticDedup(corpus, centroids, threshold = 0.95)
    assert(out.count() == corpus.count())
    assert(out.select($"id").distinct().count() == corpus.count())
    assert(out.filter($"keep" =!= ($"id" === $"rep_id")).count() == 0)
  }

  test("removeSemanticDups keeps all columns and exactly the representatives") {
    val withExtra = corpus.withColumn("src", lit("web"))
    val clean = SemDeDup.removeSemanticDups(withExtra, centroids, threshold = 0.95)
    assert(clean.columns.toSeq == Seq("id", "vec", "src"))
    assert(clean.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 5L, 6L))
  }

  test("threshold 1.0-ish keeps everything distinct; tiny threshold merges a cell") {
    val strict = SemDeDup.semanticDedup(corpus, centroids, threshold = 0.999999)
    assert(strict.filter($"keep").count() == corpus.count())
    val loose = SemDeDup.semanticDedup(corpus, centroids, threshold = 0.01)
    // cluster 0 = {1,2,3,5} all pairwise within 44 deg (cos > 0.01): one rep
    val byId = loose.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(Seq(1L, 2L, 3L, 5L).map(byId) == Seq(1L, 1L, 1L, 1L))
    assert(byId(4L) == 4L && byId(6L) == 4L) // cluster 1 = {4, 6}
  }

  test("semanticDedup fuzz: equals an independent driver-side reference on random corpora") {
    val rnd = new scala.util.Random(7)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      val d = math.sqrt(na) * math.sqrt(nb); if (d == 0.0) 0.0 else dot / d
    }
    for (round <- 1 to 3) {
      val dim = 4
      val base = (0 until 30 + rnd.nextInt(30)).map { i =>
        (i.toLong, Seq.fill(dim)(rnd.nextDouble() - 0.5))
      }
      val twins = base.filter(_._1 % 3 == 0).map { case (id, v) =>
        (id + 1000L, v.updated(0, v.head + 0.0005)) }
      val all = base ++ twins
      val centroids = base.filter(_._1 % 10 == 0).map(_._2)
      val threshold = 0.995
      // independent reference: plain-Scala argmax assignment, within-cell
      // pairs, union-find with min-id representatives
      val assign = all.map { case (id, v) =>
        val scored = centroids.zipWithIndex.map { case (c, ci) => (cos(v, c), ci) }
        id -> scored.max._2 // max (score, cid): same tie-break as the engine
      }.toMap
      val parent = scala.collection.mutable.Map(all.map(d => d._1 -> d._1): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for {
        (ia, va) <- all; (ib, vb) <- all
        if ia < ib && assign(ia) == assign(ib) && cos(va, vb) >= threshold
      } {
        val (ra, rb) = (find(ia), find(ib))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
      }
      val expect = all.map(d => (d._1, assign(d._1), find(d._1), find(d._1) == d._1)).sortBy(_._1)
      val got = SemDeDup.semanticDedup(all.toDF("id", "vec"), centroids, threshold)
        .orderBy($"id").as[(Long, Int, Long, Boolean)].collect().toSeq
      assert(got == expect, s"fuzz round $round diverged from the reference")
    }
  }

  test("semanticDedupAuto recovers planted duplicate groups end to end") {
    // two tight planted groups far apart + one singleton
    val planted = Seq(
      (10L, Seq(1.0, 0.0, 0.0, 0.0)), (11L, unit(3)), (12L, unit(-3)),
      (20L, Seq(0.0, 1.0, 0.0, 0.0)), (21L, Seq(0.001, 0.999, 0.0, 0.0)),
      (30L, Seq(0.0, 0.0, 1.0, 0.0))
    ).toDF("id", "vec")
    val got = SemDeDup.semanticDedupAuto(planted, dim = 4, k = 3, iters = 4, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(Seq(10L, 11L, 12L).map(got) == Seq(10L, 10L, 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got(30L) == 30L)
  }

  // cross-corpus sweep fixtures: the curated reference is `corpus`; fresh
  // arrivals 100 (~ref 1/2, same cell), 101 (same cell as ref 4, far from
  // it), 102 (cell 0, near ref 5 — must flag even across the 5/6 boundary
  // case because ref 5 IS in cell 0)
  private val freshArrivals = Seq(
    (100L, unit(5)),  // cell 0: cos vs ref1 = cos(5) = 0.996, vs ref2 = cos(5)
    (101L, unit(70)), // cell 1: cos vs ref4 = cos(20) = 0.94 < 0.95 — clean
    (102L, unit(43))  // cell 0: cos vs ref5 = cos(1) = 0.9998 — flagged
  ).toDF("id", "vec")

  test("crossSemanticDups flags only CROSS pairs in the shared cell; remove keeps the clean arrival") {
    val pairs = SemDeDup.crossSemanticDups(freshArrivals, corpus, centroids, threshold = 0.95)
      .select($"new_id", $"ref_id").as[(Long, Long)].collect().toSet
    // 100 ~ refs 1, 2 (cell 0; ref 3 at 20 deg: cos(15) = 0.966 — also a dup)
    assert(pairs.contains((100L, 1L)) && pairs.contains((100L, 2L)), s"got $pairs")
    assert(pairs.contains((102L, 5L)), s"got $pairs")
    assert(!pairs.exists(_._1 == 101L), s"101 must be clean, got $pairs")
    assert(!pairs.exists(p => p._1 < 100L), s"no within-reference pairs, got $pairs")
    val kept = SemDeDup.removeCrossSemanticDups(freshArrivals, corpus, centroids, 0.95)
      .select($"id").as[Long].collect().toSeq
    assert(kept == Seq(101L), s"got $kept")
  }

  test("crossSemanticDupsPrepared equals the one-shot sweep; sink is exactly-once under replay") {
    val prep = SemDeDup.crossSemanticPrepare(corpus, centroids)
    try {
      val prepared = SemDeDup.crossSemanticDupsPrepared(freshArrivals, prep, 0.95)
        .orderBy($"new_id", $"ref_id").collect().toSeq
      val oneShot = SemDeDup.crossSemanticDups(freshArrivals, corpus, centroids, 0.95)
        .orderBy($"new_id", $"ref_id").collect().toSeq
      assert(prepared == oneShot)
      val dir = java.nio.file.Files.createTempDirectory("graft-xsem").toString + "/t"
      val sink = SemDeDup.crossSemanticSink(prep, dir, threshold = 0.95,
        appId = Some("xsem-eo"))
      sink(freshArrivals, 0L)
      val v0 = graft.catalog.SnapshotTable.versions(spark, dir).max
      val rows0 = graft.catalog.SnapshotTable.read(spark, dir)
        .select($"id").as[Long].collect().toSeq
      assert(rows0 == Seq(101L), s"got $rows0") // 100/102 duplicate the reference
      sink(freshArrivals, 0L) // forced re-delivery: no rows, no version
      assert(graft.catalog.SnapshotTable.versions(spark, dir).max == v0)
      assert(graft.catalog.SnapshotTable.read(spark, dir).count() == 1)
      sink(freshArrivals.filter($"id" === 100L), 1L) // all-dup batch: no version
      assert(graft.catalog.SnapshotTable.versions(spark, dir).max == v0)
    } finally prep.release()
  }

  test("table-backed prepared cells: sweep equals the one-shot operator; " +
    "the bucketed cell layout joins exchange-free on the reference side") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true") {
      val base = java.nio.file.Files.createTempDirectory("graft-xsemt").toString
      SemDeDup.crossSemanticPrepareTable(corpus, centroids, s"$base/ref", buckets = 4)
      val prep = SemDeDup.crossSemanticPreparedFromTable(spark, s"$base/ref")
      assert(prep.centroids == centroids) // model round-trips bit-exactly
      val swept = SemDeDup.crossSemanticDupsPrepared(freshArrivals, prep, 0.95)
        .orderBy($"new_id", $"ref_id").collect().toSeq
      val oneShot = SemDeDup.crossSemanticDups(freshArrivals, corpus, centroids, 0.95)
        .orderBy($"new_id", $"ref_id").collect().toSeq
      assert(swept == oneShot)
      // with broadcast off, a probe join against the cell table must plan
      // NO exchange above the snapshot scan — only the probe side shuffles
      // into the bucket domain (the crossPrepareTable plan-pin mechanism;
      // executed / collectAll come from SparkSpec)
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        val probe = Seq(0, 1).toDF("cluster")
        val plan = executed(probe.join(prep.cells, Seq("cluster")))
        assert(collectAll(plan) { case b: BatchScanExec => b }.nonEmpty,
          s"expected a snapshot BatchScan in\n$plan")
        assert(collectAll(plan) { case s: ShuffleExchangeExec
          if collectAll(s.child) { case b: BatchScanExec => b }.nonEmpty => s }.isEmpty,
          "table-backed cell reference re-shuffled on a sweep join")
      }
      // the sink composes unchanged over the table-backed view, exactly-once
      val dir = s"$base/t"
      val sink = SemDeDup.crossSemanticSink(prep, dir, threshold = 0.95,
        appId = Some("xsemt-eo"))
      sink(freshArrivals, 0L)
      val v0 = graft.catalog.SnapshotTable.versions(spark, dir).max
      assert(graft.catalog.SnapshotTable.read(spark, dir)
        .select($"id").as[Long].collect().toSeq == Seq(101L))
      sink(freshArrivals, 0L) // forced re-delivery: no rows, no version
      assert(graft.catalog.SnapshotTable.versions(spark, dir).max == v0)
      assert(graft.catalog.SnapshotTable.read(spark, dir).count() == 1)
    }
  }

  test("crossSemanticPrepareAppend grows the reference incrementally: grown-by-append " +
    "sweep equals from-scratch prepareTable; the loaded view is version-pinned; " +
    "the append is exactly-once with an appId") {
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true") {
      val dir = java.nio.file.Files.createTempDirectory("graft-xsemg").toString + "/ref"
      SemDeDup.crossSemanticPrepareTable(
        corpus.filter($"id" <= 3L), centroids, dir, buckets = 4)
      def pairsVia(p: SemDeDup.PreparedCells): Set[(Long, Long)] =
        SemDeDup.crossSemanticDupsPrepared(freshArrivals, p, 0.95)
          .select($"new_id", $"ref_id").as[(Long, Long)].collect().toSet
      // against refs 1-3 only: 102 (~ref 5) is still clean
      val prep0 = SemDeDup.crossSemanticPreparedFromTable(spark, dir)
      val pairs0 = pairsVia(prep0)
      assert(!pairs0.exists(_._1 == 102L), s"got $pairs0")
      // grow by the remaining refs through the FROZEN recorded centroids
      SemDeDup.crossSemanticPrepareAppend(
        corpus.filter($"id" >= 4L), dir, appId = Some("xsa"), batchId = 1L)
      // the already-loaded handle is pinned: mid-sweep growth changes nothing
      assert(pairsVia(prep0) == pairs0,
        "pinned cells view must be unchanged by a mid-sweep append")
      // a crash-replayed append is a structural no-op
      val vCells = graft.catalog.SnapshotTable.versions(spark, s"$dir/cells").max
      SemDeDup.crossSemanticPrepareAppend(
        corpus.filter($"id" >= 4L), dir, appId = Some("xsa"), batchId = 1L)
      assert(graft.catalog.SnapshotTable.versions(spark, s"$dir/cells").max == vCells)
      // reloaded, the grown reference sweeps exactly like the one-shot
      // operator over the full corpus (and from-scratch prepareTable)
      val prep1 = SemDeDup.crossSemanticPreparedFromTable(spark, dir)
      val grown = SemDeDup.crossSemanticDupsPrepared(freshArrivals, prep1, 0.95)
        .orderBy($"new_id", $"ref_id").collect().toSeq
      val oneShot = SemDeDup.crossSemanticDups(freshArrivals, corpus, centroids, 0.95)
        .orderBy($"new_id", $"ref_id").collect().toSeq
      assert(grown == oneShot)
      assert(pairsVia(prep1).contains((102L, 5L)))
      // maintenance: the append-fragmented cells table compacts without
      // changing sweep results or the bucket routing
      val before = graft.catalog.SnapshotTable
        .currentManifest(spark, s"$dir/cells").get.entries.length
      SemDeDup.crossSemanticMaintain(spark, dir)
      val after = graft.catalog.SnapshotTable
        .currentManifest(spark, s"$dir/cells").get.entries.length
      assert(after < before, s"cells must compact: $after vs $before")
      val prep2 = SemDeDup.crossSemanticPreparedFromTable(spark, dir)
      assert(SemDeDup.crossSemanticDupsPrepared(freshArrivals, prep2, 0.95)
        .orderBy($"new_id", $"ref_id").collect().toSeq == oneShot)
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        val plan = executed(Seq(0, 1).toDF("cluster").join(prep2.cells, Seq("cluster")))
        assert(collectAll(plan) { case s: ShuffleExchangeExec
          if collectAll(s.child) { case b: BatchScanExec => b }.nonEmpty => s }.isEmpty,
          "compacted cell reference re-shuffled on a sweep join")
      }
    }
  }
}
