package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.catalog.{SnapshotCatalog, SnapshotTable}

/** Binpack compaction (`onlyFilesBelow`): only the small/vectored tail
  * rewrites; already-well-sized clean files are carried by reference with
  * their bytes untouched — the steady-state maintenance shape whose cost
  * tracks fragmentation, not table size.
  */
class BinpackCompactionSpec extends SparkSpec {

  private def fileInfo(dir: String): Map[String, (Long, Long)] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[(String, (Long, Long))] = fs.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory) walk(st.getPath)
      else if (st.getPath.getName.endsWith(".parquet"))
        Seq(st.getPath.getName -> (st.getLen, st.getModificationTime))
      else Seq.empty
    }
    walk(new Path(dir)).toMap
  }

  test("binpack rewrites only the small tail; big files carry byte-identical; vectored files always rewrite") {
    val dir = Files.createTempDirectory("graft-binpack").toString + "/t"
    // one big file (50k rows) + five one-file appends (100 rows each)
    SnapshotTable.write(spark,
      spark.range(0, 50000).select(col("id"), (col("id") % 3).as("g")).coalesce(1), dir)
    val bigEntry = SnapshotTable.currentManifest(spark, dir).get.entries.head
    for (i <- 0 until 5)
      SnapshotTable.append(spark, spark.range(50000 + i * 100, 50000 + (i + 1) * 100)
        .select(col("id"), (col("id") % 3).as("g")).coalesce(1), dir)
    val before = fileInfo(dir)
    assert(SnapshotTable.currentManifest(spark, dir).get.entries.length == 6)

    // threshold below the big file's size: five smalls merge, big carries
    val (nBefore, nAfter) = SnapshotTable.compact(spark, dir,
      targetBytes = 1L << 30, onlyFilesBelow = Some(bigEntry.bytes))
    assert(nBefore == 6 && nAfter == 2, s"expected 6 -> 2 files, got $nBefore -> $nAfter")
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.map(_.path).contains(bigEntry.path), "big file carried by reference")
    val after = fileInfo(dir)
    assert(after(bigEntry.path.split('/').last) == before(bigEntry.path.split('/').last),
      "carried file bytes and mtime untouched")
    assert(SnapshotTable.read(spark, dir).count() == 50500)

    // a binpack with nothing to gain is a metadata no-op (no new version)
    val vBefore = SnapshotTable.versions(spark, dir).last
    val (a, b) = SnapshotTable.compact(spark, dir,
      targetBytes = 1L << 30, onlyFilesBelow = Some(1L))
    assert(a == b && SnapshotTable.versions(spark, dir).last == vBefore,
      "no candidates -> no commit, no churn")

    // a vectored file rewrites even ABOVE the size bound (purging the
    // vector is the point), and comes out clean
    SnapshotTable.deleteMoR(spark, dir, col("id") < 100L)
    assert(SnapshotTable.currentManifest(spark, dir).get.entries.exists(_.dv.isDefined))
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 30, onlyFilesBelow = Some(1L))
    val m2 = SnapshotTable.currentManifest(spark, dir).get
    assert(m2.entries.forall(_.dv.isEmpty), "binpack must purge vectors")
    assert(SnapshotTable.read(spark, dir).count() == 50400)
  }

  test("CALL snap.system.compact(only_files_below => …) binpacks through SQL") {
    val root = Files.createTempDirectory("graft-binpack-sql").toString
    spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snap.root", root)
    val dir = s"$root/bp/t"
    SnapshotTable.write(spark,
      spark.range(0, 20000).select(col("id")).coalesce(1), dir)
    val big = SnapshotTable.currentManifest(spark, dir).get.entries.head
    for (i <- 0 until 3)
      SnapshotTable.append(spark,
        spark.range(20000 + i * 10, 20000 + (i + 1) * 10).select(col("id")).coalesce(1), dir)
    val row = spark.sql(
      s"CALL snap.system.compact(table => '$dir', only_files_below => ${big.bytes})").head()
    assert(row.getInt(0) == 4 && row.getInt(1) == 2, s"expected 4 -> 2, got $row")
    assert(SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).contains(big.path))
    assert(SnapshotTable.read(spark, dir).count() == 20030)
  }
}
