package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.catalog.SnapshotTable

/** Manifest-list segmentation: commit I/O must be O(touched), not O(live
  * files). Asserted from the BYTES on disk — manifest size stays flat as
  * the table grows, untouched segment files are carried byte-identical
  * (same modification time), a partial invalidation rewrites one segment's
  * worth, and vacuum collects expired segments without breaking reads.
  */
class SegmentedManifestSpec extends SparkSpec {

  private def logFiles(dir: String): Map[String, (Long, Long)] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir, "_log")).map(st =>
      st.getPath.getName -> (st.getLen, st.getModificationTime)).toMap
  }

  private def manifestSize(dir: String, version: Long): Long =
    logFiles(dir)(f"manifest-$version%08d.json")._1

  test("commit bytes stay O(touched): appends to a many-file table write small manifests and carry segments untouched") {
    spark.conf.set("graft.snapshot.segmentSealThreshold", "8")
    try {
      val dir = Files.createTempDirectory("graft-seg").toString + "/t"
      // v1: 40 range-partitioned files (disjoint id ranges) -> 5 sealed
      // segments of 8, 0 inline
      SnapshotTable.write(spark,
        spark.range(0, 4000).toDF("id").repartitionByRange(40, col("id")), dir)
      val m1 = SnapshotTable.currentManifest(spark, dir).get
      assert(m1.entries.length == 40, s"expected 40 files, got ${m1.entries.length}")
      assert(m1.segments.exists(_.length == 5), s"expected 5 segments, got ${m1.segments}")
      val segsAfterV1 = logFiles(dir).filter(_._1.startsWith("seg-"))

      // appends: each commit's manifest must stay ~one-file-sized (inline
      // tail only + 5 segment NAMES), nowhere near the 40-entry v1 listing
      val v1Size = manifestSize(dir, m1.version)
      SnapshotTable.append(spark, spark.range(4000, 4100).toDF("id").coalesce(1), dir)
      val m2 = SnapshotTable.currentManifest(spark, dir).get
      assert(m2.entries.length == 41)
      assert(m2.segments.exists(_.length == 5), "append carries all 5 segments by name")
      val v2Size = manifestSize(dir, m2.version)
      // the commit's write cost vs what a monolithic manifest would pay:
      // the full 40-entry listing lives in the segment files — the append
      // manifest (5 names + 1 inline entry) must be a small fraction of it
      val fullListingBytes = segsAfterV1.values.map(_._1).sum
      assert(v2Size < fullListingBytes / 5,
        s"append manifest ($v2Size B) must be far smaller than the full listing " +
          s"($fullListingBytes B across ${segsAfterV1.size} segments)")
      assert(v2Size - v1Size < 800,
        s"an append may add ~one inline entry, not re-serialize: v1=$v1Size v2=$v2Size")
      // the segment FILES are untouched bytes — same length, same mtime
      val segsAfterV2 = logFiles(dir).filter(_._1.startsWith("seg-"))
      assert(segsAfterV2 == segsAfterV1, "appends must not rewrite any segment file")

      // the resolved read is unaffected by the wire split
      assert(SnapshotTable.read(spark, dir).count() == 4100)
      assert(SnapshotTable.readVersion(spark, dir, m1.version).count() == 4000)

      // a delete scoped (by stats) to the ONE file holding the smallest
      // ids invalidates exactly one segment: its 7 survivors re-pool
      // inline; the other 4 segments carry by name
      val lowFile = m1.entries.minBy(_.stats.get("id").lo.get.toDouble)
      val hiBound = lowFile.stats.get("id").hi.get.toDouble.toLong
      val deleted = SnapshotTable.delete(spark, dir, col("id") <= hiBound)
      assert(deleted == lowFile.rows, s"expected ${lowFile.rows} rows deleted, got $deleted")
      val m3 = SnapshotTable.currentManifest(spark, dir).get
      val carried3 = m3.segments.getOrElse(Seq.empty).toSet
      val carriedFromV1 = m1.segments.get.toSet.intersect(carried3)
      assert(carriedFromV1.size == 4,
        s"exactly 4 of v1's 5 segments must survive a one-file rewrite, got $carriedFromV1")
      assert(manifestSize(dir, m3.version) < fullListingBytes / 5,
        s"a one-segment invalidation must not re-serialize the whole listing " +
          s"(manifest ${manifestSize(dir, m3.version)} B vs listing $fullListingBytes B)")
      assert(SnapshotTable.read(spark, dir).count() == 4100 - lowFile.rows)

      // vacuum with retention 1 drops v1/v2 and collects every segment no
      // retained manifest references; reads keep working
      SnapshotTable.vacuum(spark, dir, keepVersions = 1, minUnreferencedAgeMs = 0L)
      val after = logFiles(dir).keys.filter(_.startsWith("seg-")).toSet
      assert(after == m3.segments.getOrElse(Seq.empty).toSet,
        s"exactly v3's segments may remain, got $after vs ${m3.segments}")
      assert(SnapshotTable.read(spark, dir).count() == 4100 - lowFile.rows)
      // history still resolves for the retained version
      assert(SnapshotTable.history(spark, dir).count() == 1)
    } finally spark.conf.unset("graft.snapshot.segmentSealThreshold")
  }

  test("segmented and legacy inline manifests coexist; time travel resolves both") {
    spark.conf.set("graft.snapshot.segmentSealThreshold", "4")
    try {
      val dir = Files.createTempDirectory("graft-seg2").toString + "/t"
      // small commits stay fully inline (below threshold)
      SnapshotTable.write(spark, spark.range(0, 10).toDF("id").coalesce(1), dir)
      val m1 = SnapshotTable.currentManifest(spark, dir).get
      assert(m1.segments.isEmpty, "1 file stays inline")
      // growth past the threshold seals — and the sealed segment is
      // REUSED by the next commit
      for (i <- 1 to 4)
        SnapshotTable.append(spark,
          spark.range(i * 10, i * 10 + 10).toDF("id").coalesce(1), dir)
      val m5 = SnapshotTable.currentManifest(spark, dir).get
      assert(m5.segments.exists(_.nonEmpty), "5 files must have sealed a segment")
      SnapshotTable.append(spark, spark.range(100, 110).toDF("id").coalesce(1), dir)
      val m6 = SnapshotTable.currentManifest(spark, dir).get
      assert(m5.segments.get.forall(m6.segments.get.contains),
        "the next append reuses the sealed segment by name")
      assert(SnapshotTable.read(spark, dir).count() == 60)
      // every retained version still resolves exactly
      for ((v, n) <- SnapshotTable.versions(spark, dir).zipWithIndex)
        assert(SnapshotTable.readVersion(spark, dir, v).count() == (n + 1) * 10)
    } finally spark.conf.unset("graft.snapshot.segmentSealThreshold")
  }
}
