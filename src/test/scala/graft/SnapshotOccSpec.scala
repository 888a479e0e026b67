package graft

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import org.apache.spark.sql.functions._
import graft.catalog.SnapshotTable

/** Optimistic concurrency for the snapshot commit layer: every writer
  * CAS-publishes the next manifest version and rebases (or re-runs) on a
  * lost race. These tests drive REAL races — latch-released threads against
  * one table — and assert the serializable outcomes: raced appends all
  * land, raced exactly-once deliveries commit once, rewrites raced with
  * appends lose no rows, and overlapping merges both apply via retry.
  * local[*] writers share the JVM, so the striped publish mutex these
  * tests exercise is exactly the coordination point production `local`
  * mode uses; on HDFS the no-overwrite rename plays that role.
  */
class SnapshotOccSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-occ").toString

  private def df(ids: Range, dt0: String = "2024-01-01") =
    ids.toDF("id").select(
      col("id").cast("long").as("id"),
      date_add(to_date(lit(dt0)), (col("id") % 5).cast("int")).as("dt"),
      (col("id") * 2).cast("long").as("v"))

  /** Run `body` for each element on its own thread, all released together;
    * rethrows the first failure.
    */
  private def inRacingThreads[T](items: Seq[T])(body: T => Unit): Unit = {
    val start = new CountDownLatch(1)
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val threads = items.map { it =>
      new Thread(() => {
        start.await()
        try body(it) catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(120000))
    if (!errors.isEmpty) throw errors.peek()
  }

  test("raced appends from many threads all land — no lost update") {
    val dir = tmpTable()
    SnapshotTable.write(spark, df(0 until 100), dir)
    val threads = 6
    val appendsPerThread = 3
    inRacingThreads(0 until threads) { t =>
      for (b <- 0 until appendsPerThread) {
        val base = 1000 + t * 100 + b * 10
        SnapshotTable.append(spark, df(base until base + 10), dir)
      }
    }
    val got = SnapshotTable.read(spark, dir)
    assert(got.count() == 100L + threads * appendsPerThread * 10,
      "a lost commit race dropped an append")
    assert(got.select("id").distinct().count() == got.count())
    // every append is its own committed version: none were coalesced away
    assert(SnapshotTable.versions(spark, dir).length == 1 + threads * appendsPerThread)
  }

  test("racing first-batch createOrAppend writers BOTH land — creation is CAS-serialized") {
    // the exists-then-write probe this replaces was check-then-act: two
    // writers racing an UNCREATED table could both observe "not exists"
    // and the second's replace would drop the first's rows. createOrAppend
    // decides creation inside the commit loop, so the loser's retry
    // observes the winner's manifest and lands as a plain append.
    val dir = tmpTable()
    inRacingThreads(Seq(0, 100)) { base =>
      SnapshotTable.createOrAppend(spark, df(base until base + 50), dir)
    }
    val got = SnapshotTable.read(spark, dir)
    assert(got.count() == 100L, "a racing first-batch writer's rows were lost")
    assert(got.select("id").distinct().count() == 100L)
    assert(SnapshotTable.versions(spark, dir).length == 2,
      "both writers must commit their own version")
  }

  test("racing deliveries of the same exactly-once batch commit once; vacuum reclaims the loser") {
    val dir = tmpTable()
    SnapshotTable.write(spark, df(0 until 100), dir)
    val outcomes = new ConcurrentLinkedQueue[Boolean]()
    inRacingThreads(Seq("delivery-a", "delivery-b")) { _ =>
      outcomes.add(SnapshotTable.appendExactlyOnce(
        spark, df(1000 until 1010), dir, appId = "occ-stream", batchId = 1L))
    }
    import scala.jdk.CollectionConverters._
    assert(outcomes.asScala.count(identity) == 1,
      s"exactly one racing delivery must commit, got $outcomes")
    assert(SnapshotTable.read(spark, dir).count() == 110L)

    // the losing attempt's data files are unreferenced; retention deletes
    // them and afterwards every parquet on disk is manifest-listed
    SnapshotTable.vacuum(spark, dir, keepVersions = 1, minUnreferencedAgeMs = 0)
    assert(SnapshotTable.read(spark, dir).count() == 110L)
    val live = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.path).toSet
    val onDisk = {
      val root = new java.io.File(dir)
      root.listFiles().filter(d => d.isDirectory && d.getName != "_log").flatMap(d =>
        d.listFiles().filter(f => f.getName.endsWith(".parquet")).map(f => s"${d.getName}/${f.getName}"))
    }.toSet
    assert(onDisk == live, s"orphans survived vacuum: ${(onDisk -- live).take(3)}")
  }

  test("compact raced with appends rebases: nothing lost, nothing duplicated") {
    val dir = tmpTable()
    SnapshotTable.write(spark, df(0 until 200), dir)
    inRacingThreads(Seq("appender", "compactor")) {
      case "appender" =>
        for (b <- 0 until 5) {
          val base = 1000 + b * 20
          SnapshotTable.append(spark, df(base until base + 20), dir)
        }
      case _ =>
        for (_ <- 0 until 3) SnapshotTable.compact(spark, dir, targetBytes = 1L << 30)
    }
    val got = SnapshotTable.read(spark, dir)
    assert(got.count() == 300L, "compact lost a concurrently appended file")
    assert(got.select("id").distinct().count() == 300L, "compact duplicated rows")
    // quiesced compact still converges to one file
    SnapshotTable.compact(spark, dir, targetBytes = 1L << 30)
    assert(SnapshotTable.currentManifest(spark, dir).get.entries.length == 1)
    assert(SnapshotTable.read(spark, dir).count() == 300L)
  }

  test("overlapping merges conflict, retry, and BOTH apply (serializable outcome)") {
    val dir = tmpTable()
    SnapshotTable.write(spark, df(0 until 50), dir)
    val v0 = SnapshotTable.versions(spark, dir).last
    // both batches touch the same dt range → same rewrite files → the
    // loser must detect the conflict and re-run against the winner
    inRacingThreads(Seq(0, 10)) { lo =>
      val batch = df(lo until lo + 10).withColumn("v", lit(-1L - lo))
      SnapshotTable.merge(spark, batch, dir, keys = Seq("id", "dt"))
    }
    val got = SnapshotTable.read(spark, dir)
    assert(got.count() == 50L)
    assert(got.filter(col("v") === -1L).count() == 10L, "first merge's update lost")
    assert(got.filter(col("v") === -11L).count() == 10L, "second merge's update lost")
    assert(got.filter(col("v") >= 0).count() == 30L)
    assert(SnapshotTable.versions(spark, dir).last == v0 + 2, "each merge must commit a version")
  }

  test("merges into an uncovered dt range conflict rather than duplicate keys") {
    val dir = tmpTable()
    SnapshotTable.write(spark, df(0 until 50), dir) // dts 2024-01-01..05
    // both batches upsert the SAME (id, dt) keys into a dt no existing file
    // covers: each computes an EMPTY rewrite set, so the stale-read check
    // never fires — only the added-files conflict check stands between them
    // and committing the same keys twice
    def batch(tag: Long) = (1000 until 1010).toDF("id").select(
      col("id").cast("long").as("id"),
      to_date(lit("2025-06-01")).as("dt"),
      lit(tag).as("v"))
    inRacingThreads(Seq(1L, 2L)) { tag =>
      SnapshotTable.merge(spark, batch(tag), dir, keys = Seq("id", "dt"))
    }
    val got = SnapshotTable.read(spark, dir)
    assert(got.count() == 60L, "concurrent merges into an uncovered dt duplicated keys")
    assert(got.select("id", "dt").distinct().count() == 60L)
    // the loser re-ran its upsert OVER the winner: one serial order's values
    val vs = got.filter(col("id") >= 1000).select("v").as[Long].collect().toSet
    assert(vs == Set(1L) || vs == Set(2L),
      s"merged values must reflect one serial order, got $vs")
  }

  test("exactly-once stream appends race a compactor: every batch lands once, markers survive") {
    val dir = tmpTable()
    SnapshotTable.write(spark, df(0 until 100), dir)
    inRacingThreads(Seq("stream", "compactor")) {
      case "stream" =>
        for (b <- 0 until 6) {
          val base = 1000 + b * 10
          assert(SnapshotTable.appendExactlyOnce(
            spark, df(base until base + 10), dir, appId = "occ-app", batchId = b.toLong))
          // a crash re-delivery of the same batch MID-RACE must stay a
          // no-op: the watermark re-check runs against whatever manifest
          // the concurrent compactor just published
          assert(!SnapshotTable.appendExactlyOnce(
            spark, df(base until base + 10), dir, appId = "occ-app", batchId = b.toLong))
        }
      case _ =>
        for (_ <- 0 until 4) SnapshotTable.compact(spark, dir, targetBytes = 1L << 30)
    }
    val got = SnapshotTable.read(spark, dir)
    assert(got.count() == 160L, "a batch was lost or doubled under the race")
    assert(got.select("id").distinct().count() == 160L)
    val txn = SnapshotTable.currentManifest(spark, dir).get.txn.get
    assert(txn("occ-app") == 5L, s"stream watermark lost across compactions: $txn")
  }

  test("vacuum grace period protects an in-flight writer's fresh unreferenced files") {
    val dir = tmpTable()
    SnapshotTable.write(spark, df(0 until 50), dir)
    SnapshotTable.append(spark, df(100 until 150), dir) // v2: v1's listing is now sharable history
    // simulate a writer mid-commit: data files written, manifest not yet
    // published — exactly what an abandoned exactly-once twin leaves too
    val orphanDir = new java.io.File(dir, "c-inflight00001")
    orphanDir.mkdirs()
    val orphan = new java.io.File(orphanDir, "part-00000-inflight.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    // default grace: the fresh unreferenced file must SURVIVE retention
    SnapshotTable.vacuum(spark, dir, keepVersions = 1)
    assert(orphan.exists, "vacuum deleted a fresh unreferenced file inside the grace period")
    // aged past the grace: reclaimed
    orphan.setLastModified(System.currentTimeMillis() - SnapshotTable.DefaultVacuumGraceMs - 60000)
    SnapshotTable.vacuum(spark, dir, keepVersions = 1)
    assert(!orphan.exists, "vacuum must reclaim an unreferenced file older than the grace period")
    assert(SnapshotTable.read(spark, dir).count() == 100L)
  }

  test("merge refuses a batch that silently changes a column's type") {
    val dir = tmpTable()
    SnapshotTable.write(spark, df(0 until 20).withColumn("v", col("v").cast("int")), dir)
    val e = intercept[IllegalArgumentException] {
      // upsert coerces the int table column to the batch's long — recording
      // the old DDL over widened files would poison every later read, so
      // the merge must refuse before rewriting anything
      SnapshotTable.merge(spark, df(0 until 5), dir, keys = Seq("id", "dt"))
    }
    assert(e.getMessage.contains("cannot change column 'v'"))
    assert(SnapshotTable.read(spark, dir).count() == 20, "failed merge must leave the table untouched")
  }
}
