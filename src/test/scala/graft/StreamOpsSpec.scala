package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowedMetrics: tumbling event-time windows on the batch path") {
    val ev = Tables.events(spark, sfDir)
    val out = StreamOps.windowedMetrics(ev, windowLen = "1 day")
    val total = out.agg(sum("n")).as[Long].head()
    assert(total == ev.count()) // every event lands in exactly one window
    // window boundaries are day-aligned
    val misaligned = out.filter(hour(col("w_start")) =!= 0 || minute(col("w_start")) =!= 0)
    assert(misaligned.count() == 0)
  }

  test("windowedMetrics: streaming with watermark over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedMetrics(df, windowLen = "1 hour", watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    mem.addData(
      (ts("2026-01-01 10:05:00"), "click", 1.0),
      (ts("2026-01-01 10:45:00"), "click", 2.0),
      (ts("2026-01-01 11:10:00"), "view", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to close the 10:00 window
    mem.addData((ts("2026-01-01 14:00:00"), "view", 4.0))
    q.processAllAvailable()
    val rows = spark.table("win_out").orderBy("w_start", "event_type").collect()
    q.stop()
    assert(rows.exists(r => r.getAs[java.sql.Timestamp]("w_start") == ts("2026-01-01 10:00:00")
      && r.getAs[String]("event_type") == "click"
      && r.getAs[Long]("n") == 2 && r.getAs[Double]("total_value") == 3.0))
  }

  test("dedupStream: suppresses duplicate content within the watermark; batch path = exact dedup") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = StreamOps.dedupStream(df, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    mem.addData(
      (ts("2026-01-01 10:00:00"), "Hello  World"),
      (ts("2026-01-01 10:05:00"), "hello world"), // same normalized content
      (ts("2026-01-01 10:10:00"), "something else"))
    q.processAllAvailable()
    mem.addData((ts("2026-01-01 10:20:00"), "HELLO WORLD ")) // still duplicate
    q.processAllAvailable()
    val n = spark.table("dedup_out").count()
    q.stop()
    assert(n == 2, s"expected 2 unique contents, got $n")

    // batch path: same digest keying as Dedup.exactDedup
    val batch = Seq(
      (ts("2026-01-01 10:00:00"), "Hello  World"),
      (ts("2026-01-01 10:05:00"), "hello world"),
      (ts("2026-01-01 10:10:00"), "something else")).toDF("ts", "text")
    assert(StreamOps.dedupStream(batch).count() == 2)
  }

  test("sessionize: batch path splits on gaps and aggregates per session") {
    val evs = Seq(
      StreamOps.Ev(1L, ts("2026-01-01 10:00:00"), 1.0),
      StreamOps.Ev(1L, ts("2026-01-01 10:10:00"), 2.0), // same session (10m gap)
      StreamOps.Ev(1L, ts("2026-01-01 11:30:00"), 5.0), // new session (80m gap)
      StreamOps.Ev(2L, ts("2026-01-01 09:00:00"), 7.0)
    ).toDS()
    val sessions = StreamOps.sessionize(evs, gapMinutes = 30)
      .orderBy("user_id", "session_start").collect()
    assert(sessions.length == 3)
    assert(sessions(0).user_id == 1 && sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
    assert(sessions(0).session_end == ts("2026-01-01 10:10:00"))
    assert(sessions(1).user_id == 1 && sessions(1).n_events == 1 && sessions(1).total_value == 5.0)
    assert(sessions(2).user_id == 2 && sessions(2).n_events == 1)
  }

  test("sessionize: streaming path emits a session after event-time gap timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Ev]
    val withWm = mem.toDS().withWatermark("ts", "0 seconds").as[StreamOps.Ev]
    val q = StreamOps.sessionize(withWm, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    mem.addData(StreamOps.Ev(1L, ts("2026-01-01 10:00:00"), 1.0),
      StreamOps.Ev(1L, ts("2026-01-01 10:10:00"), 2.0))
    q.processAllAvailable()
    // an event far in the future advances the watermark past the session's timeout
    mem.addData(StreamOps.Ev(2L, ts("2026-01-01 12:00:00"), 9.0))
    q.processAllAvailable()
    mem.addData(StreamOps.Ev(2L, ts("2026-01-01 12:01:00"), 1.0)) // extra batch to flush timeouts
    q.processAllAvailable()
    val sessions = spark.table("sess_out").as[StreamOps.Session].collect()
    q.stop()
    val u1 = sessions.filter(_.user_id == 1L)
    assert(u1.length == 1, sessions.mkString(", "))
    assert(u1.head.n_events == 2 && u1.head.total_value == 3.0)
  }

  test("runUpsert: streaming MERGE — updates in place, re-delivery is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-stream-merge").toString
    val mem = MemoryStream[(Long, String, Double)]
    val src = mem.toDF().toDF("campaign_id", "dt", "spend")
      .withColumn("dt", to_date(col("dt")))
    val q = graft.streaming.IncrementalStream.runUpsert(
      src, s"$base/sink", s"$base/ckpt", Seq("campaign_id", "dt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    def sink() = spark.read.parquet(s"$base/sink")
      .select("campaign_id", "dt", "spend")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2))).toSet

    mem.addData((1L, "2026-01-01", 5.0), (2L, "2026-01-01", 7.0))
    q.processAllAvailable()
    assert(sink() == Set((1L, "2026-01-01", 5.0), (2L, "2026-01-01", 7.0)))

    // batch 2: update key 1 in place, insert key 3 on a new day
    mem.addData((1L, "2026-01-01", 9.0), (3L, "2026-01-02", 1.0))
    q.processAllAvailable()
    assert(sink() == Set((1L, "2026-01-01", 9.0), (2L, "2026-01-01", 7.0), (3L, "2026-01-02", 1.0)))

    // re-delivered batch (at-least-once upstream): merge must be a no-op
    mem.addData((1L, "2026-01-01", 9.0))
    q.processAllAvailable()
    assert(sink() == Set((1L, "2026-01-01", 9.0), (2L, "2026-01-01", 7.0), (3L, "2026-01-02", 1.0)))
    q.stop()
  }

  test("runUpsert: restart from checkpoint resumes exactly — no reprocess, no loss") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-stream-restart").toString
    val (srcDir, sinkDir, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "campaign_id BIGINT, dt DATE, spend DOUBLE")
    def writeBatch(rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("campaign_id", "dt", "spend").withColumn("dt", to_date(col("dt")))
        .coalesce(1).write.mode("append").parquet(srcDir)
    def stream() = graft.streaming.IncrementalStream.runUpsert(
      spark.readStream.schema(schema).parquet(srcDir), sinkDir, ckpt,
      Seq("campaign_id", "dt"),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    def sink() = spark.read.parquet(sinkDir).select("campaign_id", "dt", "spend")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2))).toSet

    writeBatch(Seq((1L, "2026-01-01", 5.0), (2L, "2026-01-01", 7.0)))
    val q1 = stream()
    assert(q1.awaitTermination(120000), "first run must drain and self-terminate")
    assert(sink() == Set((1L, "2026-01-01", 5.0), (2L, "2026-01-01", 7.0)))

    // the query is down (run N ended). DELETE the processed source files: a
    // restart can now only produce the right sink by resuming from the
    // CHECKPOINT's seen-files state — re-reading history is impossible
    val srcPath = new org.apache.hadoop.fs.Path(srcDir)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(srcPath).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.delete(f.getPath, false))
    writeBatch(Seq((1L, "2026-01-01", 9.0), (3L, "2026-01-02", 1.0)))

    val q2 = stream()
    assert(q2.awaitTermination(120000), "restarted run must drain and self-terminate")
    // equals the one-shot result: batch1 then batch2 merged in a single
    // uninterrupted pipeline (update key 1, keep key 2, insert key 3)
    assert(sink() == Set((1L, "2026-01-01", 9.0), (2L, "2026-01-01", 7.0), (3L, "2026-01-02", 1.0)))

    // a third restart with nothing new must change nothing (no re-delivery
    // of batch 2 past the checkpoint's committed offset)
    val q3 = stream()
    assert(q3.awaitTermination(120000))
    assert(sink() == Set((1L, "2026-01-01", 9.0), (2L, "2026-01-01", 7.0), (3L, "2026-01-02", 1.0)))
  }

  test("SnapshotSink: exactly-once append across restart, atomic batch visibility") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-snapsink").toString
    val (srcDir, tbl, ckpt) = (s"$base/src", s"$base/tbl", s"$base/ckpt")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v BIGINT")
    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, i.toLong * 2)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def stream() = graft.streaming.SnapshotSink.runAppend(
      spark.readStream.schema(schema).parquet(srcDir), tbl, ckpt, appId = "sinktest")

    writeBatch(0 until 20)
    assert(stream().awaitTermination(120000))
    assert(graft.catalog.SnapshotTable.read(spark, tbl).count() == 20L)

    writeBatch(100 until 110)
    assert(stream().awaitTermination(120000))
    assert(graft.catalog.SnapshotTable.read(spark, tbl).count() == 30L)

    // simulate the crash window: the table committed a batch but the
    // checkpoint didn't record it, so the batch is RE-DELIVERED — the
    // manifest's txn marker must make it a no-op
    val last = graft.catalog.SnapshotTable.versions(spark, tbl).max
    assert(!graft.catalog.SnapshotTable.appendExactlyOnce(spark,
      (100 until 110).map(i => (i.toLong, i.toLong * 2)).toDF("id", "v"), tbl, "sinktest", 1L))
    assert(graft.catalog.SnapshotTable.versions(spark, tbl).max == last, "no-op must not commit")
    assert(graft.catalog.SnapshotTable.read(spark, tbl).count() == 30L)

    // restart with nothing new: no commits, table unchanged
    assert(stream().awaitTermination(120000))
    assert(graft.catalog.SnapshotTable.read(spark, tbl).count() == 30L)
  }

  test("qualityGate and weightedMix run unchanged on a stream (map-only corpus ops)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "source")
    val gated = graft.text.TextPipelines.qualityGate(docs,
      minQuality = 0.0, minTokens = 3, maxTokens = 1000,
      langs = Seq("en", "de", "es", "fr", "und"))
    val q1 = gated.writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").start()
    mem.addData((1L, "the cat and the dog sat in the house", "s0"),
      (2L, "hi", "s0")) // below minTokens — gated out
    q1.processAllAvailable()
    q1.stop()
    val kept = spark.table("gate_stream").select("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(1L))

    val mem2 = MemoryStream[(Long, String, String)]
    val docs2 = mem2.toDF().toDF("doc_id", "text", "source")
    val mixed = graft.text.TextPipelines.weightedMix(docs2, Map("keepall" -> 1.0))
    val q2 = mixed.writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    mem2.addData((1L, "a", "keepall"), (2L, "b", "dropme"))
    q2.processAllAvailable()
    q2.stop()
    val mixKept = spark.table("mix_stream").select("doc_id").collect().map(_.getLong(0))
    assert(mixKept.toSeq == Seq(1L))
  }

  test("clickAttribution: batch path joins clicks to in-window views of the same user only") {
    val views = Seq((1L, 10L, ts("2026-01-01 10:00:00")), // in window for click 20
      (1L, 11L, ts("2026-01-01 08:00:00")), // too old
      (2L, 12L, ts("2026-01-01 10:05:00"))) // other user
      .toDF("user_id", "event_id", "ts")
    val clicks = Seq((1L, 20L, ts("2026-01-01 10:10:00")),
      (3L, 21L, ts("2026-01-01 10:10:00"))) // no view at all
      .toDF("user_id", "event_id", "ts")
    val out = StreamOps.clickAttribution(views, clicks, withinMinutes = 30)
      .select("user_id", "click_id", "view_id").collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L &&
      out.head.getLong(1) == 20L && out.head.getLong(2) == 10L)
  }

  test("clickAttribution: stream-stream interval join over two MemoryStreams") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val v = vMem.toDF().toDF("user_id", "event_id", "ts")
    val c = cMem.toDF().toDF("user_id", "event_id", "ts")
    val q = StreamOps.clickAttribution(v, c, withinMinutes = 30, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    vMem.addData((1L, 10L, ts("2026-01-01 10:00:00")), (2L, 11L, ts("2026-01-01 09:00:00")))
    cMem.addData((1L, 20L, ts("2026-01-01 10:10:00")), // matches view 10
      (2L, 21L, ts("2026-01-01 10:10:00"))) // user 2's view is 70 min old — no match
    q.processAllAvailable()
    val rows = spark.table("attr_out").select("click_id", "view_id").collect()
    q.stop()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((20L, 10L)), rows.mkString(", "))
  }
}
