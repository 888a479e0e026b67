package graft

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotTable

/** [[SnapshotTable.mergeByKey]] — the arbitrary-key MERGE: update-else-
  * insert semantics, file-level carry-by-reference for files whose key
  * bounds cannot contain a batch key (exact binary-search pruning AND the
  * over-cap range fallback), create-path, and string keys.
  */
class MergeByKeySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mbk-$tag").toString

  private def content(dir: String): Map[Long, String] =
    SnapshotTable.read(spark, dir).as[(Long, String)].collect().toMap

  private def paths(dir: String): Set[String] =
    SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet

  test("update-else-insert semantics, idempotent on replay") {
    val dir = tmp("sem")
    SnapshotTable.write(spark, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), dir)
    val batch = Seq((2L, "B"), (9L, "i")).toDF("id", "v")
    SnapshotTable.mergeByKey(spark, batch, dir, "id")
    assert(content(dir) == Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "i"))
    SnapshotTable.mergeByKey(spark, batch, dir, "id") // replay: equal content
    assert(content(dir) == Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "i"))
  }

  test("files whose key bounds miss the batch carry by reference") {
    val dir = tmp("prune")
    // three appends = three disjoint key-range file groups
    SnapshotTable.write(spark,
      (0L until 100L).map(i => (i, "lo")).toDF("id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      (1000L until 1100L).map(i => (i, "mid")).toDF("id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      (2000L until 2100L).map(i => (i, "hi")).toDF("id", "v").repartition(1), dir)
    val before = paths(dir)
    assert(before.size == 3)
    val loHi = SnapshotTable.currentManifest(spark, dir).get.entries
      .filter(e => { val b = e.stats.get("id"); b.lo.get.toDouble >= 2000.0 })
      .map(_.path).toSet ++
      SnapshotTable.currentManifest(spark, dir).get.entries
        .filter(e => e.stats.get("id").hi.get.toDouble < 1000.0).map(_.path).toSet
    assert(loHi.size == 2)
    SnapshotTable.mergeByKey(spark,
      Seq((1050L, "MID"), (1500L, "new")).toDF("id", "v"), dir, "id")
    val after = paths(dir)
    // the lo and hi files survive by path; the mid file was rewritten
    assert(loHi.subsetOf(after), s"carried files rewritten: ${loHi -- after}")
    assert((before -- loHi).intersect(after).isEmpty, "touched file not rewritten")
    assert(content(dir).view.filterKeys(k => k == 1050L || k == 1500L).toMap ==
      Map(1050L -> "MID", 1500L -> "new"))
    assert(SnapshotTable.read(spark, dir).count() == 301)
  }

  test("over-cap batches degrade to range pruning, still correct and still carry misses") {
    val dir = tmp("range")
    SnapshotTable.write(spark,
      (0L until 50L).map(i => (i, "lo")).toDF("id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      (1000L until 1050L).map(i => (i, "hi")).toDF("id", "v").repartition(1), dir)
    val loFile = SnapshotTable.currentManifest(spark, dir).get.entries
      .filter(_.stats.get("id").hi.get.toDouble < 1000.0).map(_.path).toSet
    assert(loFile.size == 1)
    // cap 3 < 10 distinct keys -> range mode; batch range [1000, 1009]
    SnapshotTable.mergeByKey(spark,
      (1000L until 1010L).map(i => (i, "HI")).toDF("id", "v"), dir, "id", maxExactKeys = 3)
    assert(loFile.subsetOf(paths(dir)))
    val got = content(dir)
    assert((1000L until 1010L).forall(i => got(i) == "HI"))
    assert((1010L until 1050L).forall(i => got(i) == "hi"))
    assert((0L until 50L).forall(i => got(i) == "lo"))
  }

  test("string keys merge and prune") {
    val dir = tmp("str")
    SnapshotTable.write(spark,
      Seq(("alpha", 1L), ("beta", 2L)).toDF("k", "n").repartition(1), dir)
    SnapshotTable.append(spark,
      Seq(("omega", 3L), ("sigma", 4L)).toDF("k", "n").repartition(1), dir)
    val early = SnapshotTable.currentManifest(spark, dir).get.entries
      .filter(_.stats.get("k").hi.get < "m").map(_.path).toSet
    assert(early.size == 1)
    SnapshotTable.mergeByKey(spark, Seq(("omega", 30L), ("zeta", 5L)).toDF("k", "n"), dir, "k")
    assert(early.subsetOf(paths(dir)))
    assert(SnapshotTable.read(spark, dir).as[(String, Long)].collect().toMap ==
      Map("alpha" -> 1L, "beta" -> 2L, "omega" -> 30L, "sigma" -> 4L, "zeta" -> 5L))
  }

  test("create path and empty batch") {
    val dir = tmp("create")
    val v = SnapshotTable.mergeByKey(spark, Seq((1L, "a")).toDF("id", "v"), dir, "id")
    assert(v == 1L)
    assert(content(dir) == Map(1L -> "a"))
    // empty batch: no version published
    SnapshotTable.mergeByKey(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir, "id")
    assert(SnapshotTable.versions(spark, dir).max == 1L)
  }

  test("MoR merge: same content as COW, ZERO data files rewritten, matched rows vectored") {
    val dir = tmp("mor")
    SnapshotTable.write(spark,
      (0L until 100L).map(i => (i, "lo")).toDF("id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      (1000L until 1100L).map(i => (i, "mid")).toDF("id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      (2000L until 2100L).map(i => (i, "hi")).toDF("id", "v").repartition(1), dir)
    val before = paths(dir)
    SnapshotTable.mergeByKeyMoR(spark,
      Seq((1050L, "MID"), (1500L, "new")).toDF("id", "v"), dir, "id")
    val m = SnapshotTable.currentManifest(spark, dir).get
    // every pre-merge file survives BY PATH (the MoR contract), plus new files
    assert(before.subsetOf(m.entries.map(_.path).toSet),
      s"MoR merge rewrote data files: ${before -- m.entries.map(_.path).toSet}")
    // exactly the key-footprint file carries a deletion vector
    val vectored = m.entries.filter(_.dv.isDefined)
    assert(vectored.map(_.dv.get.deleted).sum == 1L, s"expected 1 vectored row, got $vectored")
    val got = content(dir)
    assert(got(1050L) == "MID" && got(1500L) == "new")
    assert(SnapshotTable.read(spark, dir).count() == 301)
    // replay: content unchanged (the appended row vectors, the batch re-appends)
    SnapshotTable.mergeByKeyMoR(spark,
      Seq((1050L, "MID"), (1500L, "new")).toDF("id", "v"), dir, "id")
    assert(content(dir) == got)
    // compaction purges the vectors; content survives
    SnapshotTable.compact(spark, dir)
    assert(SnapshotTable.currentManifest(spark, dir).get.entries.forall(_.dv.isEmpty))
    assert(content(dir) == got)
  }

  test("MoR merge: pure insert appends only; create path; empty batch no-op") {
    val dir = tmp("mor-ins")
    val v = SnapshotTable.mergeByKeyMoR(spark, Seq((1L, "a")).toDF("id", "v"), dir, "id")
    assert(v == 1L && content(dir) == Map(1L -> "a"))
    SnapshotTable.mergeByKeyMoR(spark, Seq((9L, "i")).toDF("id", "v"), dir, "id")
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.forall(_.dv.isEmpty), "pure insert attached a vector")
    assert(content(dir) == Map(1L -> "a", 9L -> "i"))
    SnapshotTable.mergeByKeyMoR(spark, Seq.empty[(Long, String)].toDF("id", "v"), dir, "id")
    assert(SnapshotTable.versions(spark, dir).max == 2L)
  }

  test("foldPairs(mor = true): assignment content equals the COW fold, no file rewrites") {
    import graft.streaming.IncrementalClusters
    val cow = tmp("fold-cow"); val mor = tmp("fold-mor")
    val batches = Seq(
      Seq((1L, 2L), (10L, 11L)),
      Seq((3L, 4L), (2L, 3L)),
      Seq((20L, 21L), (1L, 4L)))
    batches.foreach { b =>
      IncrementalClusters.foldPairs(spark, cow, b.toDF("id_a", "id_b"))
      val before = SnapshotTable.currentManifest(spark, mor).map(_.entries.map(_.path).toSet)
      IncrementalClusters.foldPairs(spark, mor, b.toDF("id_a", "id_b"), mor = true)
      before.foreach { bs =>
        val after = SnapshotTable.currentManifest(spark, mor).get.entries.map(_.path).toSet
        assert(bs.subsetOf(after), s"MoR fold rewrote files: ${bs -- after}")
      }
      val a = IncrementalClusters.clusters(spark, cow).as[(Long, Long)].collect().toMap
      val c = IncrementalClusters.clusters(spark, mor).as[(Long, Long)].collect().toMap
      assert(a == c, s"diverged after batch $b")
    }
  }

  test("foldPairsScored(mor = true): assignment and reps equal the COW scored fold") {
    import graft.streaming.IncrementalClusters
    def score(id: Long): Double = ((id * 37) % 7).toDouble
    val dirs = Seq(false, true).map { mor =>
      val c = tmp(s"sf-c-$mor"); val r = tmp(s"sf-r-$mor")
      Seq(Seq((1L, 2L), (10L, 11L)), Seq((3L, 4L), (2L, 3L))).foreach { b =>
        val ids = b.flatMap(p => Seq(p._1, p._2)).distinct
        IncrementalClusters.foldPairsScored(spark, c, r, b.toDF("id_a", "id_b"),
          ids.map(id => (id, score(id))).toDF("doc_id", "score"), mor = mor)
      }
      (c, r)
    }
    val Seq((cowC, cowR), (morC, morR)) = dirs
    assert(SnapshotTable.read(spark, cowC).as[(Long, Long)].collect().toMap ==
      SnapshotTable.read(spark, morC).as[(Long, Long)].collect().toMap)
    assert(SnapshotTable.read(spark, cowR).as[(Long, Long, Double)].collect().toSet ==
      SnapshotTable.read(spark, morR).as[(Long, Long, Double)].collect().toSet)
  }

  test("composite keys: update-else-insert on (source, id); per-column footprint prunes") {
    val dir = tmp("multi")
    SnapshotTable.write(spark,
      (0L until 50L).map(i => ("web", i, "a")).toDF("src", "id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      (0L until 50L).map(i => ("books", i, "b")).toDF("src", "id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      (1000L until 1050L).map(i => ("web", i, "c")).toDF("src", "id", "v").repartition(1), dir)
    val before = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    // the id-range probe alone exonerates the third file (ids >= 1000);
    // src='books' file survives the REWRITE but its rows are keyed apart
    val idLow = SnapshotTable.currentManifest(spark, dir).get.entries
      .filter(_.stats.get("id").lo.get.toDouble >= 1000.0).map(_.path).toSet
    assert(idLow.size == 1)
    SnapshotTable.mergeByKeys(spark,
      Seq(("web", 7L, "A"), ("news", 7L, "n")).toDF("src", "id", "v"), dir, Seq("src", "id"))
    val after = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    assert(idLow.subsetOf(after), "id-footprint-exonerated file was rewritten")
    val got = SnapshotTable.read(spark, dir).as[(String, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("web", 7L)) == "A")     // updated
    assert(got(("books", 7L)) == "b")   // same id, different src: untouched
    assert(got(("news", 7L)) == "n")    // inserted
    assert(got.size == 151)
    // MoR composite: same semantics, zero rewrites
    val beforeMor = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    SnapshotTable.mergeByKeysMoR(spark,
      Seq(("books", 7L, "B")).toDF("src", "id", "v"), dir, Seq("src", "id"))
    assert(beforeMor.subsetOf(SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet))
    val got2 = SnapshotTable.read(spark, dir).as[(String, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got2(("books", 7L)) == "B" && got2(("web", 7L)) == "A" && got2.size == 151)
  }

  test("NULL keys are refused") {
    val dir = tmp("null")
    SnapshotTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val bad = Seq((Some(2L), "b"), (None, "x")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      SnapshotTable.mergeByKey(spark, bad, dir, "id")
    }
  }

  test("timestamp keys are refused; a batch lacking a table column is refused uniformly") {
    val dir = tmp("guards")
    SnapshotTable.write(spark, Seq((1L, "a", 3L)).toDF("id", "v", "extra"), dir)
    // timestamp key: stat bounds are epoch-micros, a collected key is a
    // wall-clock object — refused loudly, never wrongly pruned
    val ts = Seq((java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "x"))
      .toDF("tk", "v")
    intercept[IllegalArgumentException] {
      SnapshotTable.mergeByKey(spark, ts, dir, "tk")
    }
    // narrow batch: refused in BOTH write shapes, even when the key
    // footprint prunes every file (where the COW base degenerates to an
    // empty frame and the narrow schema would otherwise slip through)
    val narrow = Seq((999999L, "far")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      SnapshotTable.mergeByKey(spark, narrow, dir, "id")
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.mergeByKeyMoR(spark, narrow, dir, "id")
    }
  }

  test("deleteKeys: same-commit delete+upsert, footprint covers delete-only files") {
    val dir = tmp("delkeys")
    // three disjoint key-range files; the batch touches only the mid range
    // but a deleteKey hits the LO file — it must join the rewrite footprint
    SnapshotTable.write(spark,
      (0L until 100L).map(i => (i, "lo")).toDF("id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      (1000L until 1100L).map(i => (i, "mid")).toDF("id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      (2000L until 2100L).map(i => (i, "hi")).toDF("id", "v").repartition(1), dir)
    val hiFile = SnapshotTable.currentManifest(spark, dir).get.entries
      .filter(_.stats.get("id").lo.get.toDouble >= 2000.0).map(_.path).toSet
    val v0 = SnapshotTable.versions(spark, dir).max
    SnapshotTable.mergeByKeys(spark,
      Seq((1050L, "MID"), (3000L, "new")).toDF("id", "v"), dir, Seq("id"),
      deleteKeys = Seq(Seq[Any](5L), Seq[Any](6L), Seq[Any](1060L)))
    // ONE commit for upsert + delete
    assert(SnapshotTable.versions(spark, dir).max == v0 + 1)
    // untouched hi file carried by reference
    assert(hiFile.subsetOf(SnapshotTable.currentManifest(spark, dir).get.entries
      .map(_.path).toSet))
    val got = content(dir)
    assert(!got.contains(5L) && !got.contains(6L) && !got.contains(1060L))
    assert(got(1050L) == "MID" && got(3000L) == "new" && got(0L) == "lo")
    assert(got.size == 300 - 3 + 1)
    // MoR twin: same semantics, zero data files rewritten
    val dir2 = tmp("delkeys-mor")
    SnapshotTable.write(spark,
      (0L until 100L).map(i => (i, "a")).toDF("id", "v").repartition(1), dir2)
    val before2 = paths(dir2)
    SnapshotTable.mergeByKeysMoR(spark,
      Seq((7L, "UP")).toDF("id", "v"), dir2, Seq("id"),
      deleteKeys = Seq(Seq[Any](3L)))
    assert(before2.subsetOf(paths(dir2)), "MoR rewrote a data file")
    val got2 = content(dir2)
    assert(!got2.contains(3L) && got2(7L) == "UP" && got2.size == 99)
    // a key in both batch and deleteKeys: the batch wins (upsert)
    SnapshotTable.mergeByKeys(spark,
      Seq((0L, "WINS")).toDF("id", "v"), dir2, Seq("id"),
      deleteKeys = Seq(Seq[Any](0L)))
    assert(content(dir2)(0L) == "WINS")
  }

  test("over-cap NaN keys disable pruning even when absent from the sample") {
    val dir = tmp("nanrange")
    // the stale NaN row lives in a file whose STAT bounds are real-valued
    // (file stats never bound NaN) and sit BELOW the batch's real min —
    // exactly the file a range probe built from min/max alone would skip
    SnapshotTable.write(spark,
      Seq((1.0, "a"), (2.0, "b"), (Double.NaN, "stale"))
        .toDF("id", "v").repartition(1), dir)
    SnapshotTable.append(spark,
      Seq((5000.0, "far")).toDF("id", "v").repartition(1), dir)
    val before = paths(dir)
    // 11 distinct real keys + NaN > cap 3 -> range mode; whether or not the
    // truncated sample happens to include the NaN, the eager over-cap agg
    // must detect it and fall back to rewrite-everything
    val batch = ((100L until 111L).map(i => (i.toDouble, "new")) :+ ((Double.NaN, "FRESH")))
      .toDF("id", "v")
    SnapshotTable.mergeByKey(spark, batch, dir, "id", maxExactKeys = 3)
    // pruning was disabled: every pre-merge file rewrote
    assert(before.intersect(paths(dir)).isEmpty,
      s"NaN batch carried files by reference: ${before.intersect(paths(dir))}")
    val rows = SnapshotTable.read(spark, dir)
      .as[(Double, String)].collect()
    val nanRows = rows.filter { case (k, _) => k.isNaN }
    // compare fields, not tuples: Scala's NaN != NaN defeats tuple equality
    assert(nanRows.length == 1 && nanRows.head._2 == "FRESH",
      s"stale NaN row not replaced: ${nanRows.toSeq}")
    assert(rows.length == 2 + 1 + 11 + 1) // a,b + far + 11 new + one NaN
  }

  test("over-cap NULL keys are refused even when NaN short-circuits every probe") {
    val dir = tmp("nullrange")
    SnapshotTable.write(spark, Seq((1.0, "a")).toDF("id", "v"), dir)
    // > cap distinct keys (range mode), NaN present (pre-fix this made the
    // probe always-true WITHOUT forcing the lazy agg that held the NULL
    // re-check), and a NULL key that may fall beyond the collected sample
    val batch = ((0L until 10L).map(i => (java.lang.Double.valueOf(i.toDouble), "x"))
      ++ Seq((java.lang.Double.valueOf(Double.NaN), "n"),
        (null.asInstanceOf[java.lang.Double], "bad")))
      .toDF("id", "v")
    intercept[IllegalArgumentException] {
      SnapshotTable.mergeByKey(spark, batch, dir, "id", maxExactKeys = 3)
    }
  }

  test("EMPTY txn-carrying merge records its marker as a metadata-only commit") {
    val dir = tmp("emptytxn")
    SnapshotTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir) // v1
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    // marker-less empty merge: pure no-op, no version (the old contract)
    SnapshotTable.mergeByKeys(spark, empty, dir, Seq("id"))
    assert(SnapshotTable.versions(spark, dir).max == 1L)
    val pathsBefore = paths(dir)
    // txn-carrying empty merge: marker-only commit — entries and content
    // unchanged, marker recorded, so a replayed empty leg converges
    SnapshotTable.mergeByKeys(spark, empty, dir, Seq("id"), txn = Some(("legA", 7L)))
    assert(SnapshotTable.versions(spark, dir).max == 2L)
    assert(SnapshotTable.lastTxn(spark, dir, "legA").contains(7L))
    assert(content(dir) == Map(1L -> "a"))
    assert(paths(dir) == pathsBefore, "metadata-only commit must not touch data files")
    // replay of the same (and of an earlier) batch id: structural no-op
    SnapshotTable.mergeByKeys(spark, empty, dir, Seq("id"), txn = Some(("legA", 7L)))
    SnapshotTable.mergeByKeys(spark, empty, dir, Seq("id"), txn = Some(("legA", 3L)))
    assert(SnapshotTable.versions(spark, dir).max == 2L)
    // MoR shape: identical protocol
    SnapshotTable.mergeByKeysMoR(spark, empty, dir, Seq("id"), txn = Some(("legB", 1L)))
    assert(SnapshotTable.versions(spark, dir).max == 3L)
    assert(SnapshotTable.lastTxn(spark, dir, "legB").contains(1L))
    SnapshotTable.mergeByKeysMoR(spark, empty, dir, Seq("id"), txn = Some(("legB", 1L)))
    assert(SnapshotTable.versions(spark, dir).max == 3L)
    // an ABSENT table never materializes from an empty txn-carrying batch
    val ghost = tmp("emptytxn-ghost")
    SnapshotTable.mergeByKeys(spark, empty, ghost, Seq("id"), txn = Some(("legC", 0L)))
    assert(!SnapshotTable.exists(spark, ghost))
  }

  test("versionRecordingTxn: binary-search probe equals the linear contract") {
    val dir = tmp("vrt")
    SnapshotTable.write(spark, Seq((0L, "seed")).toDF("id", "v"), dir) // v1, no marker
    // markers at v2(b=0), v3(b=1), ... v6(b=4); interleave a plain append
    (0L until 5L).foreach { b =>
      SnapshotTable.mergeByKeys(spark, Seq((100L + b, s"b$b")).toDF("id", "v"),
        dir, Seq("id"), txn = Some(("app", b)))
    }
    SnapshotTable.append(spark, Seq((999L, "plain")).toDF("id", "v"), dir) // v7 carries markers
    (0L until 5L).foreach { b =>
      assert(SnapshotTable.versionRecordingTxn(spark, dir, "app", b).contains(2L + b),
        s"batch $b should resolve to version ${2L + b}")
    }
    // never-recorded ids: below, above, and unknown appId
    assert(SnapshotTable.versionRecordingTxn(spark, dir, "app", 99L).isEmpty)
    assert(SnapshotTable.versionRecordingTxn(spark, dir, "ghost", 0L).isEmpty)
    // ROLLBACK restores an older txn map (re-deliveries must re-apply) —
    // the probe's non-monotone fallback still finds the exact commit
    SnapshotTable.rollback(spark, dir, 3L) // v8 records app -> 1
    assert(SnapshotTable.lastTxn(spark, dir, "app").contains(1L))
    assert(SnapshotTable.versionRecordingTxn(spark, dir, "app", 1L).contains(3L))
    assert(SnapshotTable.versionRecordingTxn(spark, dir, "app", 4L).contains(6L))
  }

}
