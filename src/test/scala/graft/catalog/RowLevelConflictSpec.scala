package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Package-private seams of the row-level commit: the MERGE
  * conflict-on-adds discipline at the commitRewrite layer (the SQL-level
  * race cannot be paused mid-statement, so the guard is pinned where it
  * lives), plus `_file`-addressed candidate pruning.
  */
class RowLevelConflictSpec extends graft.SparkSpec {

  test("commitRewrite: a MERGE-style commit conflicts on concurrently ADDED files; UPDATE-style rebases") {
    val dir = Files.createTempDirectory("graft-rlc").toString + "/t"
    SnapshotTable.write(spark, spark.range(0, 100).select(col("id")), dir)
    val base = SnapshotTable.currentManifest(spark, dir).get
    // a concurrent append lands AFTER the operation pinned `base`
    SnapshotTable.append(spark, spark.range(100, 150).select(col("id")), dir)

    // MERGE discipline: the insert-vs-update decisions never saw the added
    // file — rebasing could commit duplicate keys, so it must conflict
    val e = intercept[SnapshotTable.SnapshotConflictException] {
      SnapshotTable.commitRewrite(spark, dir, "merge", base,
        read = base.entries.map(_.path).toSet,
        removed = base.entries.map(_.path).toSet,
        added = Seq.empty, conflictOnAdds = true)
    }
    assert(e.getMessage.contains("MERGE"), e.getMessage)
    assert(SnapshotTable.read(spark, dir).count() == 150,
      "the refused commit must leave the table untouched")

    // UPDATE/DELETE discipline: not touching the appended rows is the
    // valid "this command ran first" serialization — the rebase lands and
    // the appended file is carried forward
    SnapshotTable.commitRewrite(spark, dir, "update", base,
      read = base.entries.map(_.path).toSet,
      removed = base.entries.map(_.path).toSet,
      added = Seq.empty, conflictOnAdds = false)
    assert(SnapshotTable.read(spark, dir).count() == 50,
      "base files removed, concurrently appended file carried")
  }

  test("UPDATE ... WHERE _file = <path>: provenance-addressed surgical rewrite of exactly one file") {
    val dir = Files.createTempDirectory("graft-rlfile").toString + "/t"
    spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
    SnapshotTable.write(spark,
      spark.range(0, 50).select(col("id"), lit("a").as("tag")).repartition(1), dir)
    SnapshotTable.append(spark,
      spark.range(50, 100).select(col("id"), lit("a").as("tag")).repartition(1), dir)
    val before = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path)
    assert(before.size == 2)

    // pick one file BY PROVENANCE and rewrite only it
    val target = spark.sql(s"SELECT _file FROM snap.`$dir` WHERE id = 75 LIMIT 1")
      .head().getString(0)
    spark.sql(s"UPDATE snap.`$dir` SET tag = 'only-this-file' WHERE _file = '$target'")

    val after = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    assert(before.count(after.contains) == 1,
      s"exactly one file may be rewritten: before=$before after=$after")
    val hit = SnapshotTable.read(spark, dir).filter(col("tag") === "only-this-file")
    assert(hit.count() == 50 && hit.agg(min(col("id"))).head().getLong(0) == 50,
      "all rows of the addressed file (and only them) must be updated")
  }
}
