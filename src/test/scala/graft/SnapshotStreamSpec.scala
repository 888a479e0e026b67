package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.catalog.SnapshotTable
import graft.streaming.SnapshotSourceProvider

/** The snapshot table as a streaming source: committed appends become
  * micro-batches, versions are the offsets, and Spark's offset log plus
  * the table's immutability give exactly-once delivery ACROSS RESTARTS —
  * driven here with real StreamingQuery runs against one table.
  */
class SnapshotStreamSpec extends SparkSpec {
  import spark.implicits._

  test("appends stream as micro-batches exactly once, surviving a checkpointed restart") {
    val dir = Files.createTempDirectory("graft-stream-src").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    def rows(a: Int, b: Int) = (a until b).toDF("id").select(
      col("id").cast("long").as("id"), (col("id") * 3).cast("long").as("v"))

    SnapshotTable.write(spark, rows(0, 100), dir)
    SnapshotTable.append(spark, rows(100, 150), dir)

    val received = new ConcurrentLinkedQueue[Long]() // ids, across all batches
    def start() = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => received.add(r.getLong(0)))
      }
      .start()

    // first run drains the table's current history (both commits)
    val q1 = start()
    q1.processAllAvailable()
    // a new append while the query runs arrives as its own micro-batch
    SnapshotTable.append(spark, rows(150, 175), dir)
    q1.processAllAvailable()
    q1.stop()
    import scala.jdk.CollectionConverters._
    assert(received.asScala.toSeq.sorted == (0L until 175L),
      s"first run must deliver every appended row exactly once, got ${received.size}")

    // restart from the checkpoint: ONLY rows committed after the stop flow
    SnapshotTable.append(spark, rows(175, 200), dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(received.asScala.toSeq.sorted == (0L until 200L),
      "restart must resume from the committed offset — no replay, no loss")

    // idle restart with nothing new delivers nothing
    val sizeBefore = received.size()
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(received.size() == sizeBefore, "an idle restart must not re-deliver")
  }

  test("maxVersionsPerBatch rate-limits a backfill into bounded micro-batches") {
    val dir = Files.createTempDirectory("graft-stream-rate").toString
    val ckpt = Files.createTempDirectory("graft-stream-rate-ckpt").toString
    def rows(a: Int, b: Int) = (a until b).toDF("id").select(col("id").cast("long").as("id"))
    // six committed versions of 10 rows each — a long-history backfill
    SnapshotTable.write(spark, rows(0, 10), dir)
    (1 until 6).foreach(k => SnapshotTable.append(spark, rows(k * 10, k * 10 + 10), dir))

    val batchSizes = new ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir)
      .option("maxVersionsPerBatch", "2")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count()); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq.filter(_ > 0)
    assert(sizes.sum == 60L, s"backfill must deliver every row, got $sizes")
    assert(sizes.forall(_ <= 20L),
      s"each micro-batch must stay within 2 versions (20 rows), got $sizes")
    assert(sizes.length >= 3, s"6 versions at 2/batch need >= 3 batches, got $sizes")
  }

  test("rate-limited backfill anchors at the earliest RETAINED version after vacuum") {
    val dir = Files.createTempDirectory("graft-stream-vac").toString
    val ckpt = Files.createTempDirectory("graft-stream-vac-ckpt").toString
    def rows(a: Int, b: Int) = (a until b).toDF("id").select(col("id").cast("long").as("id"))
    SnapshotTable.write(spark, rows(0, 10), dir)
    (1 until 6).foreach(k => SnapshotTable.append(spark, rows(k * 10, k * 10 + 10), dir))
    // expire manifests 1..4 — a cap anchored at version 0 would hand
    // getBatch an end offset whose manifest no longer exists and
    // permanently fail the stream; the anchor must be the earliest
    // retained version instead
    SnapshotTable.vacuum(spark, dir, keepVersions = 2, minUnreferencedAgeMs = 0L)
    assert(SnapshotTable.versions(spark, dir) == Seq(5L, 6L))

    val received = new ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir)
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => received.add(r.getLong(0)))
      }
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(received.asScala.toSeq.sorted == (0L until 60L),
      "a rate-limited backfill over a vacuumed table must start from the " +
        s"oldest retained manifest and deliver every live row, got ${received.size}")
  }

  test("resuming a checkpointed stream past vacuumed versions fails loudly, never silently skips") {
    val dir = Files.createTempDirectory("graft-stream-vacfail").toString
    val ckpt = Files.createTempDirectory("graft-stream-vacfail-ckpt").toString
    def rows(a: Int, b: Int) = (a until b).toDF("id").select(col("id").cast("long").as("id"))
    SnapshotTable.write(spark, rows(0, 10), dir)
    def start() = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val q1 = start()
    q1.processAllAvailable() // checkpoint commits offset = version 1
    q1.stop()
    // the table moves on; retention is violated relative to the
    // checkpoint's lag (keepVersions=1 < 3 versions behind)
    (1 until 4).foreach(k => SnapshotTable.append(spark, rows(k * 10, k * 10 + 10), dir))
    SnapshotTable.vacuum(spark, dir, keepVersions = 1, minUnreferencedAgeMs = 0L)
    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("not available")),
      s"resume past vacuumed history must raise the missing-manifest error, got: ${messages(e)}")
  }

  test("maxFilesPerBatch bounds the files a micro-batch delivers; oversized commits surface alone") {
    val dir = Files.createTempDirectory("graft-stream-files").toString
    val ckpt = Files.createTempDirectory("graft-stream-files-ckpt").toString
    def rows(a: Int, b: Int, parts: Int) =
      (a until b).toDF("id").select(col("id").cast("long").as("id")).repartition(parts)
    // five versions x 2 files of ~5 rows, then one oversized 6-file commit
    SnapshotTable.write(spark, rows(0, 10, 2), dir)
    (1 until 5).foreach(k => SnapshotTable.append(spark, rows(k * 10, k * 10 + 10, 2), dir))
    SnapshotTable.append(spark, rows(50, 60, 6), dir)

    val batchSizes = new ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir)
      .option("maxFilesPerBatch", "4")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count()); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq.filter(_ > 0)
    assert(sizes.sum == 60L, s"file-capped backfill must deliver every row, got $sizes")
    // 4 files ≈ 2 versions ≈ 20 rows per batch, except the 6-file commit
    // which exceeds the cap on its own and must still surface (alone)
    assert(sizes.forall(_ <= 20L), s"each micro-batch must stay within 4 files (~20 rows), got $sizes")
    assert(sizes.length >= 3, s"5 two-file versions + 1 six-file version at 4 files/batch need >= 3 batches, got $sizes")
  }

  test("additive schema evolution mid-stream projects to the pinned schema; restart sees the new column") {
    val dir = Files.createTempDirectory("graft-stream-schema").toString
    val ckpt = Files.createTempDirectory("graft-stream-schema-ckpt").toString
    SnapshotTable.write(spark, (0 until 10).toDF("id").select(col("id").cast("long").as("id")), dir)

    val seenSchemas = new ConcurrentLinkedQueue[String]()
    val received = new ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) seenSchemas.add(df.columns.mkString(","))
        df.select("id").collect().foreach(r => received.add(r.getLong(0)))
      }
      .start()
    val q1 = start()
    q1.processAllAvailable()
    // additive evolution while the query runs: new column `extra`
    SnapshotTable.append(spark, (10 until 20).toDF("id").select(
      col("id").cast("long").as("id"), lit("x").as("extra")), dir)
    q1.processAllAvailable()
    q1.stop()
    import scala.jdk.CollectionConverters._
    assert(seenSchemas.asScala.toSet == Set("id"),
      s"mid-stream batches must stay pinned to the start schema, got $seenSchemas")
    assert(received.asScala.toSeq.sorted == (0L until 20L))

    // a restarted query pins the evolved schema and surfaces the column
    SnapshotTable.append(spark, (20 until 30).toDF("id").select(
      col("id").cast("long").as("id"), lit("y").as("extra")), dir)
    seenSchemas.clear()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seenSchemas.asScala.toSet == Set("id,extra"),
      s"restart must pick up the evolved schema, got $seenSchemas")
  }

  test("streaming from a snapshot table into a snapshot table is exactly-once end to end") {
    val src = Files.createTempDirectory("graft-stream-e2e-src").toString
    val dst = Files.createTempDirectory("graft-stream-e2e-dst").toString
    val ckpt = Files.createTempDirectory("graft-stream-e2e-ckpt").toString
    def rows(a: Int, b: Int) = (a until b).toDF("id").select(
      col("id").cast("long").as("id"),
      date_add(to_date(lit("2024-01-01")), (col("id") % 5).cast("int")).as("dt"))

    SnapshotTable.write(spark, rows(0, 80), src)
    val q = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", src)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!df.isEmpty)
          SnapshotTable.appendExactlyOnce(df.sparkSession, df, dst,
            appId = "e2e-loop", batchId = batchId)
        ()
      }
      .start()
    q.processAllAvailable()
    SnapshotTable.append(spark, rows(80, 120), src)
    q.processAllAvailable()
    q.stop()
    val got = SnapshotTable.read(spark, dst)
    assert(got.count() == 120L && got.select("id").distinct().count() == 120L,
      "table -> stream -> table must land every row exactly once")
  }

  test("change-feed mode streams row-level changes across merge and delete commits, no replay on restart") {
    val dir = Files.createTempDirectory("graft-stream-cdf").toString
    val ckpt = Files.createTempDirectory("graft-stream-cdf-ckpt").toString
    // merge requires dt in the key; a fixed dt keeps row identity = (id, dt)
    def rows(a: Int, b: Int) = (a until b).toDF("id").select(
      col("id").cast("long").as("id"), (col("id") * 3).cast("long").as("v"),
      to_date(lit("2024-01-01")).as("dt"))

    SnapshotTable.write(spark, rows(0, 20), dir) // v1

    // (kind, commitVersion, id, v) across all micro-batches
    val received = new ConcurrentLinkedQueue[(String, Long, Long, Long)]()
    def start() = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir)
      .option("readChangeFeed", "true")
      .option("changeFeedKeys", "id,dt")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("_change_type"), col("_commit_version"), col("id"), col("v"))
          .collect()
          .foreach(r => received.add((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))
      }
      .start()
    import scala.jdk.CollectionConverters._

    // initial backfill: the v1 contents arrive as plain inserts
    val q1 = start()
    q1.processAllAvailable()
    assert(received.asScala.toSeq.sorted ==
      (0L until 20L).map(i => ("insert", 1L, i, i * 3)).sorted,
      s"backfill must surface as inserts of v1, got ${received.asScala.toSeq.sorted}")

    // a merge while the stream runs: update ids 0-4 (changed v), insert
    // ids 100-102 — streams as pre+post images plus inserts, and the
    // carried rows rewritten value-identical stay silent
    val upd = (0 until 5).map(i => (i.toLong, i * 3L + 1000L))
    val ins = (100 until 103).map(i => (i.toLong, i * 3L))
    val batch = (upd ++ ins).toDF("id", "v")
      .withColumn("dt", to_date(lit("2024-01-01")))
    SnapshotTable.merge(spark, batch, dir, keys = Seq("id", "dt")) // v2
    q1.processAllAvailable()
    val afterMerge = received.asScala.toSeq.filter(_._2 == 2L).sorted
    val wantMerge = (
      (0 until 5).map(i => ("update_preimage", 2L, i.toLong, i * 3L)) ++
      (0 until 5).map(i => ("update_postimage", 2L, i.toLong, i * 3L + 1000L)) ++
      (100 until 103).map(i => ("insert", 2L, i.toLong, i * 3L))).sorted
    assert(afterMerge == wantMerge, s"merge commit changes diverge: $afterMerge")

    // a row-level delete streams as delete rows
    SnapshotTable.delete(spark, dir, col("id") >= 10L && col("id") < 12L) // v3
    q1.processAllAvailable()
    q1.stop()
    assert(received.asScala.toSeq.filter(_._2 == 3L).sorted ==
      Seq(("delete", 3L, 10L, 30L), ("delete", 3L, 11L, 33L)),
      "delete commit must stream as delete rows")

    // checkpointed restart with nothing new: no replay
    val before = received.size()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(received.size() == before, "idle change-feed restart must not re-deliver")

    // the mode is explicit about its requirements
    val e = intercept[IllegalArgumentException](spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir).option("readChangeFeed", "true").load())
    assert(e.getMessage.contains("changeFeedKeys"))
  }

  test("writeStream.toTable through the DSv2 catalog: exactly-once epochs, atomic per-batch commits, restart-safe") {
    val dir = Files.createTempDirectory("graft-stream-sink").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-stream-sink-ckpt").toString
    spark.conf.set("spark.sql.catalog.snap",
      classOf[graft.catalog.SnapshotCatalog].getName)
    // provision the table so inserts resolve against a declared schema
    SnapshotTable.write(spark,
      spark.range(0, 0).select(col("id"), (col("id") * 2).as("v")), dir)

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    def start() = mem.toDF().select(col("value").as("id"), (col("value") * 2).as("v"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .toTable(s"snap.`$dir`")

    val q1 = start()
    mem.addData(0L until 50L: _*)
    q1.processAllAvailable()
    mem.addData(50L until 80L: _*)
    q1.processAllAvailable()
    q1.stop()

    val afterTwo = SnapshotTable.read(spark, dir)
    assert(afterTwo.count() == 80, "both micro-batches must land")
    // each non-empty epoch is ONE atomic commit with an op marker and a
    // txn watermark recorded for the query
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.txn.exists(_.keys.exists(_.startsWith("dsv2-"))),
      s"streaming epochs must record exactly-once txn markers, got ${m.txn}")

    // restart from the checkpoint: only new data flows, nothing replays
    val q2 = start()
    mem.addData(80L until 100L: _*)
    q2.processAllAvailable()
    q2.stop()
    val got = SnapshotTable.read(spark, dir).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 100L), s"restart must neither replay nor lose rows (got ${got.size})")

    // the sink composes with SQL row-level ops on the same table
    spark.sql(s"UPDATE snap.`$dir` SET v = -1 WHERE id % 47 = 5")
    assert(SnapshotTable.read(spark, dir).filter(col("v") === -1).count() == 3,
      "ids 5, 52, 99 of 0..99 satisfy id % 47 = 5")
  }

  test("streaming epochs into a partitioned table route per value: SPJ stays provable under ingest") {
    // executed / collectAll come from SparkSpec
    def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
      collectAll(executed(df)) {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s }.size

    val base = Files.createTempDirectory("graft-stream-routed").toString
    spark.conf.set("spark.sql.catalog.snap", classOf[graft.catalog.SnapshotCatalog].getName)

    // identity-partitioned stream target + a co-partitioned static side
    val dir = s"$base/t"
    SnapshotTable.write(spark,
      spark.range(0, 0).select((col("id") % 8).as("k"), col("id").as("v")), dir,
      partitionCols = Some(Seq("k")))
    SnapshotTable.write(spark,
      spark.range(0, 800).select((col("id") % 8).as("k"), (col("id") * 7).as("w")),
      s"$base/dim", partitionCols = Some(Seq("k")))

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val q = mem.toDF().select((col("value") % 8).as("k"), col("value").as("v"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-routed-ckpt").toString)
      .toTable(s"snap.`$dir`")
    mem.addData(0L until 400L: _*)
    q.processAllAvailable()
    mem.addData(400L until 800L: _*)
    q.processAllAvailable()
    q.stop()

    // every epoch file routed under its partition-value directory, with
    // exact one-value stats
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.nonEmpty)
    m.entries.foreach { e =>
      assert(e.path.contains("__p_k="), s"epoch file must route: ${e.path}")
      val s = e.stats.get("k")
      assert(s.lo == s.hi && s.nulls == 0, s"${e.path}: stats must prove one value, got $s")
    }
    assert(SnapshotTable.read(spark, dir).count() == 800)

    // the join layout survives continuous streaming ingest: zero shuffles
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val joined = spark.sql(
        s"SELECT t.k, t.v, d.w FROM snap.`$dir` t JOIN snap.`$base/dim` d ON t.k = d.k")
      assert(shuffleCount(joined) == 0,
        "streaming epochs must keep the storage-partitioned join shuffle-free")
      assert(joined.count() == 800L * 100)
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")

    // BUCKET-routed epochs carry the n-in-marker directory and agree with
    // the batch writers' bucket id row by row
    val bdir = s"$base/b"
    SnapshotTable.write(spark,
      spark.range(0, 0).select(col("id").as("bk"), col("id").as("v")), bdir,
      partitionCols = Some(Seq("bucket(4,bk)")))
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val q2 = mem2.toDF().select(col("value").as("bk"), (col("value") * 2).as("v"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-routed-ckpt2").toString)
      .toTable(s"snap.`$bdir`")
    mem2.addData(0L until 300L: _*)
    q2.processAllAvailable()
    q2.stop()
    val bm = SnapshotTable.currentManifest(spark, bdir).get
    bm.entries.foreach { e =>
      assert(e.path.contains("__pb_4_bk="), s"bucket epoch file must route: ${e.path}")
      val id = e.path.split("__pb_4_bk=")(1).takeWhile(_ != '/').toInt
      val inFile = spark.read.parquet(s"$bdir/${e.path}")
        .select(pmod(xxhash64(col("bk")), lit(4L)).cast("int").as("want")).distinct()
        .collect().map(_.getInt(0)).toSeq
      assert(inFile == Seq(id), s"${e.path}: rows hash to $inFile, directory says $id")
    }

    // HIGH-CARDINALITY backstop: a task streaming many interleaved
    // partition values must not spray row-sized files — LRU rotation plus
    // the per-task file cap bound the count, with overflow pooling into
    // un-routed root files (conservative reads, never wrong routing)
    val hdir = s"$base/h"
    SnapshotTable.write(spark,
      spark.range(0, 0).select((col("id") % 40).as("hk"), col("id").as("v")), hdir,
      partitionCols = Some(Seq("hk")))
    val memH = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val qh = memH.toDF().select((col("value") % 40).as("hk"), col("value").as("v"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-routed-ckpth").toString)
      .toTable(s"snap.`$hdir`")
    memH.addData(0L until 4000L: _*)
    qh.processAllAvailable()
    qh.stop()
    val hm = SnapshotTable.currentManifest(spark, hdir).get
    assert(hm.entries.size < 300,
      s"40 interleaved values must stay bounded, wrote ${hm.entries.size} files")
    hm.entries.filter(_.path.contains("__p_hk=")).foreach { e =>
      val s = e.stats.get("hk")
      assert(s.lo == s.hi, s"routed file ${e.path} must hold one value, got $s")
    }
    assert(SnapshotTable.read(spark, hdir).count() == 4000)
    assert(SnapshotTable.read(spark, hdir).groupBy("hk").count()
      .collect().forall(_.getLong(1) == 100), "every key must keep exactly its rows")

    // unroutable values (unsafe string) fall back to un-routed root files:
    // reads stay correct, the layout just degrades conservatively
    val sdir = s"$base/s"
    SnapshotTable.write(spark,
      spark.range(0, 0).select(lit("x").as("g"), col("id").as("v")), sdir,
      partitionCols = Some(Seq("g")))
    val mem3 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val q3 = mem3.toDF().select(
      when(col("value") % 2 === 0, lit("safe")).otherwise(lit("a/b=c")).as("g"),
      col("value").as("v"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-routed-ckpt3").toString)
      .toTable(s"snap.`$sdir`")
    mem3.addData(0L until 100L: _*)
    q3.processAllAvailable()
    q3.stop()
    val sm = SnapshotTable.currentManifest(spark, sdir).get
    assert(sm.entries.exists(_.path.contains("__p_g=safe")),
      "safe string values must still route")
    assert(sm.entries.exists(e => !e.path.contains("__p_g=")),
      "unsafe values must land un-routed, never mis-escaped")
    assert(SnapshotTable.read(spark, sdir).count() == 100)
    assert(SnapshotTable.read(spark, sdir).filter(col("g") === "a/b=c").count() == 50)
  }

  test("identity-TIMESTAMP epochs route as zone-free epoch-micros dirs and keep SPJ provable") {
    // executed / collectAll come from SparkSpec
    def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
      collectAll(executed(df)) {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s }.size

    val base = Files.createTempDirectory("graft-stream-routed-ts").toString
    spark.conf.set("spark.sql.catalog.snap", classOf[graft.catalog.SnapshotCatalog].getName)

    // identity timestamp partitioning: 4 distinct hour marks
    def tsOf(h: Column): Column = timestamp_seconds(h * 3600)
    val dir = s"$base/t"
    SnapshotTable.write(spark,
      spark.range(0, 0).select(tsOf(col("id") % 4).as("ts"), col("id").as("v")), dir,
      partitionCols = Some(Seq("ts")))
    // the static join side goes through the BATCH writer, whose identity
    // directories use Hive session-tz rendering — deliberately different
    // from the streaming `<micros>us` form, because SPJ keys come from
    // footer stats, never from `__p_` path segments
    SnapshotTable.write(spark,
      spark.range(0, 4).select(tsOf(col("id")).as("ts"), (col("id") * 7).as("w")),
      s"$base/dim", partitionCols = Some(Seq("ts")))

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val q = mem.toDF().select(tsOf(col("value") % 4).as("ts"), col("value").as("v"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-routed-ts-ckpt").toString)
      .toTable(s"snap.`$dir`")
    mem.addData(0L until 200L: _*)
    q.processAllAvailable()
    mem.addData(200L until 400L: _*)
    q.processAllAvailable()
    q.stop()

    // every epoch file routes under __p_ts=<epoch-micros>us — injective,
    // zone-free, filesystem-safe — and its footer stats prove ONE value
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.nonEmpty)
    m.entries.foreach { e =>
      assert(e.path.contains("__p_ts="), s"epoch file must route: ${e.path}")
      val seg = e.path.split("__p_ts=")(1).takeWhile(_ != '/')
      assert(seg.endsWith("us") && seg.dropRight(2).forall(_.isDigit),
        s"identity-timestamp dirs must be raw epoch micros, got $seg in ${e.path}")
      val micros = seg.dropRight(2).toLong
      assert(micros % (3600L * 1000000) == 0 && micros / (3600L * 1000000) < 4,
        s"${e.path}: directory micros must be one of the 4 hour marks")
      val s = e.stats.get("ts")
      assert(s.lo == s.hi && s.nulls == 0, s"${e.path}: stats must prove one value, got $s")
    }
    // values round-trip exactly: the …us directory form is a pure layout
    // artifact, data rides in the files
    assert(SnapshotTable.read(spark, dir).count() == 400)
    assert(SnapshotTable.read(spark, dir).groupBy("ts").count()
      .collect().forall(_.getLong(1) == 100), "each hour mark keeps exactly its rows")

    // SPJ stays provable across the batch-Hive / streaming-micros rendering
    // divergence: zero Exchanges joining on the identity ts key
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val joined = spark.sql(
        s"SELECT t.ts, t.v, d.w FROM snap.`$dir` t JOIN snap.`$base/dim` d ON t.ts = d.ts")
      assert(shuffleCount(joined) == 0,
        "identity-timestamp routed epochs must keep the storage-partitioned join shuffle-free")
      assert(joined.count() == 400)
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("a crashed attempt's leftover part file cannot wedge a replayed epoch") {
    val dir = Files.createTempDirectory("graft-stream-leftover").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-stream-leftover-ckpt").toString
    spark.conf.set("spark.sql.catalog.snap",
      classOf[graft.catalog.SnapshotCatalog].getName)
    SnapshotTable.write(spark,
      spark.range(0, 0).select(col("id"), (col("id") * 2).as("v")), dir)

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    def start() = mem.toDF().select(col("value").as("id"), (col("value") * 2).as("v"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .toTable(s"snap.`$dir`")

    val q1 = start()
    mem.addData(0L until 30L: _*)
    q1.processAllAvailable()
    q1.stop()
    // learn the epoch-dir naming from the committed epoch-0 files, then
    // PLANT a leftover in epoch 1's (deterministic) directory — the state
    // an unclean driver stop leaves when abort never ran and a fresh
    // SparkContext restarts task ids at 0. Attempt file names carry a
    // per-attempt random token, so the replay must land beside the
    // leftover instead of wedging on parquet's create-mode collision.
    val m1 = SnapshotTable.currentManifest(spark, dir).get
    val e0dir = m1.entries.map(_.path.split('/').head).distinct
      .find(_.startsWith("c-str-")).getOrElse(fail(s"no epoch dir in ${m1.entries.map(_.path)}"))
    val e1dir = e0dir.replaceAll("-e0$", "-e1")
    assert(e1dir != e0dir, s"epoch dir $e0dir must end in its epoch id")
    val leftoverDir = new java.io.File(s"$dir/$e1dir")
    assert(leftoverDir.mkdirs())
    // a plausible crashed-attempt name (old deterministic scheme) with
    // garbage bytes — worse than any real leftover
    val leftover = new java.io.File(leftoverDir, "part-00000-0.snappy.parquet")
    java.nio.file.Files.write(leftover.toPath, Array.fill(64)(0x5a.toByte))

    val q2 = start()
    mem.addData(30L until 60L: _*)
    q2.processAllAvailable()
    q2.stop()

    val got = SnapshotTable.read(spark, dir).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 60L), s"epoch 1 must land despite the leftover (got ${got.size})")
    val m2 = SnapshotTable.currentManifest(spark, dir).get
    assert(!m2.entries.exists(_.path.endsWith("part-00000-0.snappy.parquet")),
      "the planted leftover must never be referenced by a manifest")
    // vacuum collects the orphan (zero grace: nothing in flight here)
    SnapshotTable.vacuum(spark, dir, keepVersions = 1, minUnreferencedAgeMs = 0L)
    assert(!leftover.exists(), "vacuum must collect the unreferenced leftover")
  }

  test("startingVersion / startingTimestamp skip the older backfill; checkpoint restarts ignore them") {
    val dir = Files.createTempDirectory("graft-stream-startat").toString
    def rows(a: Int, b: Int) = (a until b).toDF("id").select(
      col("id").cast("long").as("id"))

    SnapshotTable.write(spark, rows(0, 50), dir) // v1
    SnapshotTable.append(spark, rows(50, 80), dir) // v2
    val tsBeforeV3 = SnapshotTable.commitTimes(spark, dir).last._2.get + 1
    SnapshotTable.append(spark, rows(80, 100), dir) // v3

    def drain(extra: (String, String)*): Seq[Long] = {
      val received = new ConcurrentLinkedQueue[Long]()
      val reader = spark.readStream
        .format(classOf[SnapshotSourceProvider].getName)
        .option("path", dir)
      extra.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load().writeStream
        .option("checkpointLocation", Files.createTempDirectory("graft-sv-ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => received.add(r.getLong(0)))
        }.start()
      q.processAllAvailable(); q.stop()
      import scala.jdk.CollectionConverters._
      received.asScala.toSeq.sorted
    }

    // version anchor: deliver v2 onward, never v1's rows
    assert(drain("startingVersion" -> "2") == (50L until 100L))
    // timestamp anchor: the first commit stamped at-or-after ts is v3
    assert(drain("startingTimestamp" -> tsBeforeV3.toString) == (80L until 100L))
    // a pre-history timestamp = the full retained backfill, not an error
    assert(drain("startingTimestamp" -> "0") == (0L until 100L))
    // past the newest commit: starts empty, surfaces only future commits
    val late = SnapshotTable.commitTimes(spark, dir).last._2.get + 60000
    assert(drain("startingTimestamp" -> late.toString).isEmpty)

    // a checkpointed restart keeps its recovered offsets — the anchor
    // only shapes a FRESH query
    val ckpt = Files.createTempDirectory("graft-sv-restart").toString
    val received = new ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir).option("startingVersion", "3")
      .load().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => received.add(r.getLong(0)))
      }.start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    SnapshotTable.append(spark, rows(100, 120), dir) // v4
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    import scala.jdk.CollectionConverters._
    assert(received.asScala.toSeq.sorted == (80L until 120L),
      "restart resumes from the checkpoint: v3's rows once, then v4's — no v1/v2 replay")

    // refusals: both anchors, or a version below 1
    intercept[Exception] {
      drain("startingVersion" -> "2", "startingTimestamp" -> "0")
    }
    intercept[Exception] { drain("startingVersion" -> "0") }
  }

  test("a FUTURE startingVersion never leaks pre-anchor versions once the table grows past it") {
    // the regression shape: a query starts while the table is still BELOW
    // the anchor. getOffset must log the anchor itself, not the table's
    // current version — a logged pre-anchor offset would make a later
    // getBatch(log, newer) deliver the versions the anchor promised to skip
    val dir = Files.createTempDirectory("graft-stream-future-anchor").toString
    def rows(a: Int, b: Int) = (a until b).toDF("id").select(col("id").cast("long").as("id"))
    SnapshotTable.write(spark, rows(0, 10), dir) // v1
    SnapshotTable.append(spark, rows(10, 20), dir) // v2
    val ckpt = Files.createTempDirectory("graft-future-anchor-ckpt").toString
    val received = new ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream
      .format(classOf[SnapshotSourceProvider].getName)
      .option("path", dir).option("startingVersion", "5")
      .load().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => received.add(r.getLong(0)))
      }.start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(received.isEmpty, "the table is below the anchor: nothing may surface")
    SnapshotTable.append(spark, rows(20, 30), dir) // v3 — pre-anchor
    SnapshotTable.append(spark, rows(30, 40), dir) // v4 — pre-anchor
    SnapshotTable.append(spark, rows(40, 50), dir) // v5 — first delivered
    SnapshotTable.append(spark, rows(50, 60), dir) // v6
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    import scala.jdk.CollectionConverters._
    assert(received.asScala.toSeq.sorted == (40L until 60L),
      "v3/v4 predate the anchor and must never be delivered, even across a restart")
  }

  test("anchors whose base version was vacuumed deliver the full retained backfill, not a dead stream") {
    val dir = Files.createTempDirectory("graft-stream-anchor-vac").toString
    def rows(a: Int, b: Int) = (a until b).toDF("id").select(col("id").cast("long").as("id"))
    SnapshotTable.write(spark, rows(0, 10), dir) // v1
    (1 until 5).foreach(k => SnapshotTable.append(spark, rows(k * 10, k * 10 + 10), dir)) // v2..v5
    val tsBeforeV2 = SnapshotTable.commitTimes(spark, dir)(1)._2.get - 1
    // expire v1..v3: the earliest retained version is 4, whose BASE
    // manifest (3) no longer exists
    SnapshotTable.vacuum(spark, dir, keepVersions = 2, minUnreferencedAgeMs = 0L)
    assert(SnapshotTable.versions(spark, dir) == Seq(4L, 5L))

    def drain(extra: (String, String)*): Seq[Long] = {
      val received = new ConcurrentLinkedQueue[Long]()
      val reader = spark.readStream
        .format(classOf[SnapshotSourceProvider].getName)
        .option("path", dir)
      extra.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load().writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-anchor-vac-ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => received.add(r.getLong(0)))
        }.start()
      q.processAllAvailable(); q.stop()
      import scala.jdk.CollectionConverters._
      received.asScala.toSeq.sorted
    }

    // startingVersion == the earliest retained version: its base (v3) is
    // expired, so the anchor resolves to the full retained backfill —
    // every row live at v5 — instead of permanently failing on a missing
    // manifest
    assert(drain("startingVersion" -> "4") == (0L until 50L))
    // a startingTimestamp predating retained history resolves (via
    // versionSinceTimestamp) to the earliest retained version — same path
    assert(drain("startingTimestamp" -> tsBeforeV2.toString) == (0L until 50L))
    // an anchor INSIDE the retained window is honored exactly: base v4 is
    // retained, so only v5's files are delivered
    assert(drain("startingVersion" -> "5") == (40L until 50L))
  }
}
