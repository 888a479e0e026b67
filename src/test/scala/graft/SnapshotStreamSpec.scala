package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

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
}
