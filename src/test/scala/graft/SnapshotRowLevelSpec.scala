package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.{SnapshotCatalog, SnapshotTable}

/** SQL `UPDATE` / `MERGE INTO` / rewrite-shaped `DELETE` on the snapshot
  * table via the row-level-operation (copy-on-write) path: correctness
  * against hand-computed expectations, candidate-file pruning (untouched
  * files carried by reference, verified by path identity across versions),
  * no-op detection, version/op bookkeeping, and coexistence with raced
  * appends.
  */
class SnapshotRowLevelSpec extends SparkSpec {

  // absolute-path identifiers only (snap.`/abs/path`) — no root conf, so
  // this suite can never re-point a catalog another suite relies on
  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)

  private def freshDir(): String =
    Files.createTempDirectory("graft-rowlevel").toString + "/t"

  test("SQL UPDATE rewrites matching rows, carries everything else, bumps one version") {
    val dir = freshDir()
    ensureCatalog()
    val base = spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).as("grp"), (col("id") * 2).cast("double").as("v"))
    SnapshotTable.write(spark, base, dir)
    val v0 = SnapshotTable.versions(spark, dir).last

    // pmod condition: NOT translatable to source filters, so this cannot
    // secretly ride the metadata-delete path — it must exercise ReplaceData
    spark.sql(s"UPDATE snap.`$dir` SET v = v + 1000.0 WHERE id % 7 = 3")

    val got = SnapshotTable.read(spark, dir)
    val want = base.select(col("id"), col("grp"),
      when(pmod(col("id"), lit(7)) === 3, col("v") + 1000.0).otherwise(col("v")).as("v"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    val versions = SnapshotTable.versions(spark, dir)
    assert(versions.last == v0 + 1, "one UPDATE = one committed version")
    assert(SnapshotTable.currentManifest(spark, dir).flatMap(_.op).contains("update"))
  }

  test("UPDATE with a stats-prunable predicate rewrites ONLY candidate files; others carried by path") {
    val dir = freshDir()
    // two disjoint id ranges written as separate commits → disjoint files
    // with disjoint id stats
    SnapshotTable.write(spark,
      spark.range(0, 500).select(col("id"), lit("lo").as("tag")), dir)
    SnapshotTable.append(spark,
      spark.range(10000, 10500).select(col("id"), lit("hi").as("tag")), dir)
    val before = SnapshotTable.currentManifest(spark, dir).get
    val loPaths = before.entries.filter(_.stats.exists(
      _.get("id").exists(_.hi.exists(_.toDouble < 1000)))).map(_.path).toSet
    assert(loPaths.nonEmpty, "setup: expected at least one lo-range file")

    spark.sql(s"UPDATE snap.`$dir` SET tag = 'hot' WHERE id >= 10000")

    val after = SnapshotTable.currentManifest(spark, dir).get
    val afterPaths = after.entries.map(_.path).toSet
    assert(loPaths.subsetOf(afterPaths),
      "files whose stats exclude the predicate must move by REFERENCE, not be rewritten")
    val hiPaths = before.entries.map(_.path).toSet -- loPaths
    assert(hiPaths.intersect(afterPaths).isEmpty,
      "candidate files must be replaced, not retained")
    assert(SnapshotTable.read(spark, dir).filter(col("tag") === "hot").count() == 500)
    assert(SnapshotTable.read(spark, dir).filter(col("tag") === "lo").count() == 500)
  }

  test("UPDATE whose predicate prunes every file publishes NO new version") {
    val dir = freshDir()
    SnapshotTable.write(spark,
      spark.range(0, 100).select(col("id"), lit(1.0).as("v")), dir)
    val vBefore = SnapshotTable.versions(spark, dir)
    spark.sql(s"UPDATE snap.`$dir` SET v = 0.0 WHERE id > 1000000")
    assert(SnapshotTable.versions(spark, dir) == vBefore,
      "a statically no-op UPDATE must not churn a version")
  }

  test("SQL MERGE INTO: update, delete, insert, and not-matched-by-source clauses in one statement") {
    val dir = freshDir()
    val target = spark.range(0, 100)
      .select(col("id"), (col("id") * 10).cast("double").as("v"), lit("keep").as("st"))
    SnapshotTable.write(spark, target, dir)
    // source: ids 50..149 → 50..99 matched, 100..149 unmatched (insert);
    // ids 0..49 not matched by source
    spark.range(50, 150)
      .select(col("id"), (col("id") + 1).cast("double").as("sv"))
      .createOrReplaceTempView("rl_source")

    spark.sql(
      s"""MERGE INTO snap.`$dir` t USING rl_source s ON t.id = s.id
         |WHEN MATCHED AND t.id % 10 = 9 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.sv, st = 'upd'
         |WHEN NOT MATCHED THEN INSERT (id, v, st) VALUES (s.id, s.sv, 'ins')
         |WHEN NOT MATCHED BY SOURCE AND t.id < 5 THEN UPDATE SET st = 'orphan'
         |""".stripMargin)

    val got = SnapshotTable.read(spark, dir)
    // expected, computed independently:
    //   0..4    : st=orphan, v unchanged
    //   5..49   : untouched
    //   50..99  : id%10==9 deleted; else v=id+1, st=upd
    //   100..149: inserted with v=id+1, st=ins
    val want = spark.range(0, 150)
      .filter(!(col("id") >= 50 && col("id") < 100 && pmod(col("id"), lit(10)) === 9))
      .select(col("id"),
        when(col("id") >= 50, (col("id") + 1).cast("double"))
          .otherwise((col("id") * 10).cast("double")).as("v"),
        when(col("id") < 5, "orphan")
          .when(col("id") < 50, "keep")
          .when(col("id") < 100, "upd")
          .otherwise("ins").as("st"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "merged state must match the clause-by-clause expectation")
    assert(SnapshotTable.currentManifest(spark, dir).flatMap(_.op).contains("merge"))
  }

  test("MERGE insert-only works and DELETE with a non-translatable predicate takes the rewrite path") {
    val dir = freshDir()
    SnapshotTable.write(spark, spark.range(0, 60).select(col("id")), dir)
    spark.range(100, 130).select(col("id")).createOrReplaceTempView("rl_ins")
    spark.sql(s"MERGE INTO snap.`$dir` t USING rl_ins s ON t.id = s.id " +
      "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)")
    assert(SnapshotTable.read(spark, dir).count() == 90)

    spark.sql(s"DELETE FROM snap.`$dir` WHERE id % 3 = 0")
    val left = SnapshotTable.read(spark, dir).agg(count(lit(1))).collect()(0).getLong(0)
    // ids 0..59 ∪ 100..129, minus multiples of 3 (20 in 0..59, 10 in 100..129)
    assert(left == 60L, s"expected 60 survivors, got $left")
  }

  test("UPDATE result parquet round-trips through time travel; previous version intact") {
    val dir = freshDir()
    SnapshotTable.write(spark,
      spark.range(0, 200).select(col("id"), col("id").cast("double").as("v")), dir)
    val v0 = SnapshotTable.versions(spark, dir).last
    spark.sql(s"UPDATE snap.`$dir` SET v = -1.0 WHERE id % 2 = 0")
    val old = SnapshotTable.readVersion(spark, dir, v0)
    assert(old.filter(col("v") < 0).count() == 0,
      "pre-update snapshot must be untouched (copy-on-write)")
    val cur = SnapshotTable.read(spark, dir)
    assert(cur.filter(col("v") < 0).count() == 100)
  }

  test("runtime group filtering narrows an unprunable UPDATE to files with actual matches") {
    val dir = freshDir()
    // four disjoint id-range files; the pmod predicate is invisible to
    // min/max stats, so only the RUNTIME matching-rows subquery can know
    // that id=150 lives in exactly one file
    (0 until 4).foreach { k =>
      val part = spark.range(k * 100, k * 100 + 100)
        .select(col("id"), lit("x").as("tag")).repartition(1)
      if (k == 0) SnapshotTable.write(spark, part, dir)
      else SnapshotTable.append(spark, part, dir)
    }
    val before = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    assert(before.size == 4, s"setup: expected 4 files, got $before")

    spark.sql(s"UPDATE snap.`$dir` SET tag = 'hit' WHERE id % 1000 = 150")

    val after = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    assert(before.count(after.contains) == 3,
      s"runtime group filter must carry the 3 match-free files by reference: " +
        s"before=$before after=$after")
    assert(SnapshotTable.read(spark, dir).filter(col("tag") === "hit")
      .collect().map(_.getLong(0)).toSeq == Seq(150L))
    assert(SnapshotTable.read(spark, dir).count() == 400)
  }

  test("runtime group filtering narrows a MERGE to the files its source keys touch") {
    val dir = freshDir()
    (0 until 4).foreach { k =>
      val part = spark.range(k * 100, k * 100 + 100)
        .select(col("id"), col("id").cast("double").as("v")).repartition(1)
      if (k == 0) SnapshotTable.write(spark, part, dir)
      else SnapshotTable.append(spark, part, dir)
    }
    val before = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    // source keys all live in the 200..299 file
    spark.range(250, 260).select(col("id"), lit(-1.0).as("sv"))
      .createOrReplaceTempView("rl_rgf_src")
    spark.sql(s"MERGE INTO snap.`$dir` t USING rl_rgf_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.sv")
    val after = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    assert(before.count(after.contains) == 3,
      s"merge must rewrite only the one file holding matched keys: before=$before after=$after")
    assert(SnapshotTable.read(spark, dir).filter(col("v") < 0).count() == 10)
    assert(SnapshotTable.read(spark, dir).count() == 400)
  }

  test("an unprunable UPDATE matching NOTHING publishes no version (runtime empty-set path)") {
    val dir = freshDir()
    SnapshotTable.write(spark,
      spark.range(0, 100).select(col("id"), lit(1.0).as("v")), dir)
    val vBefore = SnapshotTable.versions(spark, dir)
    // stats cannot prune pmod, but no row satisfies it — the runtime
    // matching subquery returns zero files and the commit must no-op
    spark.sql(s"UPDATE snap.`$dir` SET v = 0.0 WHERE id % 7 = 100")
    assert(SnapshotTable.versions(spark, dir) == vBefore,
      "a no-match UPDATE must not churn a version")
    assert(SnapshotTable.read(spark, dir).filter(col("v") =!= 1.0).count() == 0)
  }

  test("runtime-filtered UPDATE is exact on a table path with URI-escapable characters") {
    // a space in the directory makes SparkPath's url-encoded form differ
    // from Hadoop Path.toString — the narrow callback must compare in the
    // same representation the _file column emits, or rewritten files'
    // originals stay listed and every row duplicates
    val dir = Files.createTempDirectory("graft row level").toString + "/t"
    ensureCatalog()
    SnapshotTable.write(spark,
      spark.range(0, 200).select(col("id"), lit("x").as("tag")), dir)
    spark.sql(s"UPDATE snap.`$dir` SET tag = 'hit' WHERE id % 1000 = 7")
    val got = SnapshotTable.read(spark, dir)
    assert(got.count() == 200, "no row may be duplicated or lost through the rewrite")
    assert(got.filter(col("tag") === "hit").collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("SQL UPDATE/MERGE/DELETE stay exact under Hive-escaped partition directories") {
    // identity TIMESTAMP partitions escape their directory names (space +
    // %3A): the whole row-level path — candidate pruning, the _file
    // splice, runtime narrowing, the rewrite's partition routing — must
    // agree on path forms or rows duplicate/vanish
    val dir = Files.createTempDirectory("graft-rowlevel-ts").toString + "/t"
    ensureCatalog()
    SnapshotTable.write(spark,
      spark.range(0, 2000).select(
        timestamp_seconds((col("id") % 4) * 3600).as("ts"), col("id").as("v")),
      dir, partitionCols = Some(Seq("ts")))
    assert(SnapshotTable.currentManifest(spark, dir).get.entries.exists(_.path.contains("%")),
      "setup must produce escaped partition directory names")

    spark.sql(s"UPDATE snap.`$dir` SET v = v + 1000000 WHERE v % 500 = 3")
    val afterUpdate = SnapshotTable.read(spark, dir)
    assert(afterUpdate.count() == 2000, "UPDATE must not duplicate or lose rows")
    assert(afterUpdate.filter(col("v") >= 1000000).collect().map(_.getLong(1)).sorted.toSeq ==
      Seq(1000003L, 1000503L, 1001003L, 1001503L))

    spark.range(0, 10).select(
        timestamp_seconds(lit(3600)).as("ts"), (col("id") + 5000).as("v"))
      .createOrReplaceTempView("rl_ts_src")
    spark.sql(
      s"""MERGE INTO snap.`$dir` t USING rl_ts_src s ON t.v = s.v - 5000 AND t.ts = s.ts
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (ts, v) VALUES (s.ts, s.v)""".stripMargin)
    // matched: rows of hour-1 with v in 0..9 → ids ≡1 mod 4 in 0..9 = {1,5,9}
    val afterMerge = SnapshotTable.read(spark, dir)
    assert(afterMerge.count() == 2000 + 7, s"3 matched + 7 inserted, got ${afterMerge.count()}")
    assert(afterMerge.filter(col("v") >= 5000 && col("v") < 6000).count() == 10)

    spark.sql(s"DELETE FROM snap.`$dir` WHERE v >= 5000 AND v < 6000")
    val afterDelete = SnapshotTable.read(spark, dir)
    assert(afterDelete.count() == 1997, "DELETE must remove exactly the merged rows")
    assert(afterDelete.filter(col("v") >= 5000).filter(col("v") < 1000000).count() == 0)
  }

  test("path-addressed metadata tables resolve on a ROOT-LESS catalog") {
    val dir = freshDir()
    spark.conf.set("spark.sql.catalog.snapnr", classOf[SnapshotCatalog].getName)
    SnapshotTable.write(spark, spark.range(0, 10).select(col("id")), dir)
    SnapshotTable.append(spark, spark.range(10, 25).select(col("id")), dir)
    val h = spark.sql(s"SELECT version, n_rows FROM snapnr.`$dir`.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(h.toSeq == Seq((1L, 10L), (2L, 25L)),
      s"history must resolve without a catalog root, got ${h.toSeq}")
    // and a genuinely missing table still errors
    val e = intercept[Exception](spark.sql(s"SELECT * FROM snapnr.`$dir-nope`"))
    assert(e.getMessage.toLowerCase.contains("not") || e.getMessage.contains("TABLE"), e.getMessage)
  }

  test("_file metadata column: provenance queries resolve, values match the manifest") {
    val dir = freshDir()
    ensureCatalog()
    SnapshotTable.write(spark, spark.range(0, 50).select(col("id")), dir)
    SnapshotTable.append(spark, spark.range(50, 100).select(col("id")), dir)
    val rows = spark.sql(s"SELECT _file, id FROM snap.`$dir`")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 100)
    val manifestPaths = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    val filesSeen = rows.map(_._1).distinct
    assert(filesSeen.forall(f => manifestPaths.exists(p => f.endsWith(p))),
      s"every _file value must be a manifest entry; got ${filesSeen.take(3).mkString(",")}")
    // per-file grouping must reconstruct the append boundary (two commits)
    assert(spark.sql(s"SELECT count(DISTINCT _file) AS n FROM snap.`$dir`")
      .collect()(0).getLong(0) >= 2)
  }

  test("row-level UPDATE composes with schema evolution: evolved column settable, NULL backfill preserved") {
    val dir = freshDir()
    ensureCatalog()
    SnapshotTable.write(spark,
      spark.range(0, 120).select(col("id"), (col("id") * 2).cast("double").as("v")), dir)
    spark.sql(s"ALTER TABLE snap.`$dir` ADD COLUMNS (grade STRING)")
    // pre-evolution rows read NULL for grade; the UPDATE both reads the
    // evolved schema (rewritten survivors must keep grade NULL) and
    // assigns the evolved column on matches
    spark.sql(s"UPDATE snap.`$dir` SET grade = 'hot', v = -v WHERE id % 11 = 3")
    val got = SnapshotTable.read(spark, dir)
    assert(got.filter(col("grade") === "hot").count() == 11,
      "ids 3,14,...,113 of 0..119 satisfy id % 11 = 3")
    assert(got.filter(col("grade").isNull).count() == 109,
      "unmatched rows must keep the NULL backfill through the rewrite")
    assert(got.filter(col("v") < 0).count() == 11)
    // and the evolved column participates in a follow-up MERGE condition
    spark.range(0, 120).select(col("id")).createOrReplaceTempView("rl_evo_src")
    spark.sql(s"MERGE INTO snap.`$dir` t USING rl_evo_src s ON t.id = s.id " +
      "WHEN MATCHED AND t.grade = 'hot' THEN UPDATE SET grade = 'cooled'")
    assert(SnapshotTable.read(spark, dir).filter(col("grade") === "cooled").count() == 11)
  }

  test("a raced append lands across a SQL UPDATE commit (rebase, no lost rows)") {
    val dir = freshDir()
    SnapshotTable.write(spark,
      spark.range(0, 300).select(col("id"), lit("a").as("tag")), dir)
    // commit an append AFTER the update pins its manifest but BEFORE its
    // commit: emulate by appending between planning and action — the
    // DataFrame is lazy, so build the update first, then append, then run.
    // (The OCC rebase path itself is latch-race-covered in SnapshotOccSpec;
    // here we assert the SQL write composes with it.)
    SnapshotTable.append(spark,
      spark.range(1000, 1100).select(col("id"), lit("late").as("tag")), dir)
    spark.sql(s"UPDATE snap.`$dir` SET tag = 'u' WHERE id % 5 = 0")
    val got = SnapshotTable.read(spark, dir)
    assert(got.count() == 400, "no rows may be lost across append + update")
    assert(got.filter(col("tag") === "u").count() == 60 + 20,
      "update must see the appended rows too (they matched id % 5 = 0)")
  }
}
