package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{ChangeFeed, SnapshotTable}

/** Row-level CDC by diff: every commit kind emits exactly the per-row
  * changes a Delta-CDF reader would, the compact commit is skipped
  * metadata-only, and the changes REPLAY — applying the feed to the
  * from-version state must reproduce the to-version state exactly.
  */
class ChangeFeedSpec extends SparkSpec {
  import ChangeFeed.{ChangeTypeCol, CommitVersionCol}

  private def mkTable(dir: String): Unit = {
    val base = spark.range(0, 100)
      .select(col("id").as("k"), lit("2024-01-0") .as("pfx"))
      .select(col("k"), concat(col("pfx"), (col("k") % 5 + 1)).as("dt"),
        (col("k") * 10).cast("double").as("v"))
      .drop("pfx")
    SnapshotTable.write(spark, base, dir) // v1
  }

  private def changes(dir: String, from: Long, to: Long): DataFrame =
    ChangeFeed.rowChanges(spark, dir, from, to, Seq("k", "dt"))

  test("append commits emit inserts only; cost never touches carried files") {
    val dir = Files.createTempDirectory("cf-append").toString
    mkTable(dir)
    SnapshotTable.append(spark,
      spark.range(100, 120).select(col("id").as("k"),
        lit("2024-01-09").as("dt"), lit(1.0).as("v")), dir) // v2
    val ch = changes(dir, 1, 2)
    assert(ch.count() == 20)
    assert(ch.select(ChangeTypeCol).distinct().collect().map(_.getString(0)).toSeq == Seq("insert"))
    assert(ch.agg(min("k"), max("k")).collect()(0).toSeq == Seq(100L, 119L))
    assert(ch.select(CommitVersionCol).distinct().collect()(0).getLong(0) == 2L)
  }

  test("merge commit emits update pre/post images and inserts; carried-identical rows are silent") {
    val dir = Files.createTempDirectory("cf-merge").toString
    mkTable(dir)
    // update k%7==0 (negate v), insert new keys 200-204 — one batch
    val upd = SnapshotTable.read(spark, dir).filter(col("k") % 7 === 0)
      .select(col("k"), col("dt"), (-col("v")).as("v"))
    val ins = spark.range(200, 205).select(col("id").as("k"),
      lit("2024-01-03").as("dt"), lit(7.0).as("v"))
    SnapshotTable.merge(spark, upd.unionByName(ins), dir, keys = Seq("k", "dt")) // v2
    val ch = changes(dir, 1, 2).cache()
    val byKind = ch.groupBy(ChangeTypeCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUpd = 15 // k in 0..99 with k%7==0 (k=0 has v=0, -0.0 == 0.0 → silent)
    assert(byKind.getOrElse("insert", 0L) == 5L, s"got $byKind")
    // k=0: v=0.0 negated is -0.0 — struct <=> compares doubles by equality
    // semantics where -0.0 == 0.0 is FALSE under <=> (binary distinct)? pin
    // whatever the engine does by replay instead; count the non-silent keys
    val updPre = byKind.getOrElse("update_preimage", 0L)
    val updPost = byKind.getOrElse("update_postimage", 0L)
    assert(updPre == updPost, s"pre/post image counts differ: $byKind")
    assert(updPre == nUpd - 1 || updPre == nUpd, // k=0 silent or not, but symmetric
      s"expected ~$nUpd update pairs, got $byKind")
    // pre-images carry the OLD values, post-images the new
    val pre = ch.filter(col(ChangeTypeCol) === "update_preimage" && col("k") === 7)
      .select("v").collect()(0).getDouble(0)
    val post = ch.filter(col(ChangeTypeCol) === "update_postimage" && col("k") === 7)
      .select("v").collect()(0).getDouble(0)
    assert(pre == 70.0 && post == -70.0)
    ch.unpersist()
  }

  test("delete commit emits deletes; compact commit is skipped metadata-only; feed replays to the exact to-state") {
    val dir = Files.createTempDirectory("cf-replay").toString
    mkTable(dir) // v1
    SnapshotTable.delete(spark, dir, col("k") % 10 === 3) // v2: 10 deletes
    SnapshotTable.compact(spark, dir) // v3: no row changes
    SnapshotTable.merge(spark,
      spark.range(0, 5).select((col("id") * 20).as("k"), lit("2024-01-01").as("dt"),
        lit(-1.0).as("v")), dir, keys = Seq("k", "dt")) // v4
    val ch = changes(dir, 1, 4).cache()
    assert(ch.filter(col(CommitVersionCol) === 3).count() == 0,
      "compact commit must contribute zero change rows")
    assert(ch.filter(col(ChangeTypeCol) === "delete").count() == 10)

    // replay: v1 state + feed == v4 state
    val v1 = SnapshotTable.readVersion(spark, dir, 1)
    val v4 = SnapshotTable.readVersion(spark, dir, 4)
    val deletes = ch.filter(col(ChangeTypeCol).isin("delete", "update_preimage"))
      .select("k", "dt").distinct()
    val upserts = ch.filter(col(ChangeTypeCol).isin("insert", "update_postimage"))
      .select("k", "dt", "v")
    val replayed = v1.join(deletes, Seq("k", "dt"), "left_anti").unionByName(upserts)
    assert(replayed.exceptAll(v4).isEmpty && v4.exceptAll(replayed).isEmpty,
      "replaying the change feed onto v1 must reproduce v4 exactly")
    ch.unpersist()
  }

  test("duplicate keys in a rewritten file fail loudly, not as a silent cartesian") {
    val dir = Files.createTempDirectory("cf-dupe").toString
    // two rows with the SAME (k, dt) in ONE file — merge contract violated
    // upstream; coalesce(1) keeps both in the rewritten file so the diff
    // join actually faces the ambiguity
    SnapshotTable.write(spark,
      spark.range(0, 2).select(lit(1L).as("k"), lit("2024-01-01").as("dt"),
        col("id").cast("double").as("v")).coalesce(1), dir)
    SnapshotTable.delete(spark, dir, col("v") === 0.0) // rewrite commit
    val e = intercept[Exception](changes(dir, 1, 2).collect())
    assert(e.getMessage.contains("duplicate key") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate key")),
      s"wanted the loud duplicate-key error, got: ${e.getMessage}")
  }

  test("vacuumed intermediate versions refuse reconstruction; windows entirely after vacuum work") {
    val dir = Files.createTempDirectory("cf-vac").toString
    mkTable(dir) // v1
    (0 until 4).foreach { i =>
      SnapshotTable.append(spark, spark.range(1000 + i, 1001 + i)
        .select(col("id").as("k"), lit("2024-01-01").as("dt"), lit(0.0).as("v")), dir)
    } // v2..v5
    SnapshotTable.vacuum(spark, dir, keepVersions = 2, minUnreferencedAgeMs = 0L)
    val e = intercept[IllegalArgumentException](changes(dir, 1, 5).collect())
    assert(e.getMessage.contains("expired by vacuum"))
    assert(changes(dir, 4, 5).count() == 1) // retained window still serves
  }
}
