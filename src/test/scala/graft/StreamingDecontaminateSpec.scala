package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.catalog.SnapshotTable
import graft.dedup.Decontaminate

/** Decontaminate-on-ingest: the prepared-benchmark sweep must flag exactly
  * what the one-shot sweep flags, and the `foreachBatch` sink must land
  * exactly the batch pipeline's clean set — streamed in any batching.
  */
class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta other tail words"),
    (3L, "completely disjoint text with no overlap at all"),
    (4L, "short doc"),
    (5L, "alpha beta gamma delta epsilon zeta"),
    (6L, "another perfectly clean document body here")
  ).toDF("doc_id", "text")

  private val bench = corpus.filter($"doc_id" === 2).select($"text")

  test("ngramOverlapPrepared flags EQUAL the one-shot sweep's") {
    val prep = Decontaminate.prepare(bench, n = 4)
    try {
      val a = Decontaminate.ngramOverlapPrepared(corpus, prep).orderBy($"doc_id")
      val b = Decontaminate.ngramOverlap(corpus, bench, n = 4).orderBy($"doc_id")
      assert(a.collect().toSeq == b.collect().toSeq)
      // the prepared sweep keeps the scan-stage bloom discard
      val plan = a.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"), plan)
    } finally prep.release()
  }

  test("empty prepared benchmark: nothing flagged") {
    val prep = Decontaminate.prepare(bench.filter(lit(false)), n = 4)
    try {
      val flags = Decontaminate.ngramOverlapPrepared(corpus, prep)
      assert(flags.filter($"contaminated").count() == 0)
      assert(flags.count() == corpus.count())
    } finally prep.release()
  }

  test("sink lands exactly the batch pipeline's clean set, streamed in halves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdecon").toString + "/t"
    val prep = Decontaminate.prepare(bench, n = 4)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        Decontaminate.sink(prep, dir)(b.toDF(), id)
      }
      .start()
    try {
      val rows = corpus.as[(Long, String)].collect().toSeq
      val (b1, b2) = rows.partition(_._1 <= 3)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val landed = SnapshotTable.read(spark, dir)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      val batchClean = Decontaminate.removeContaminated(corpus, bench, n = 4)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(landed == batchClean)
      // contaminated ids (1, 2, 5) never landed
      assert(!landed.exists(Set(1L, 2L, 5L)))
    } finally {
      q.stop()
      prep.release()
    }
  }

  test("an all-contaminated batch publishes NO table version") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdecon2").toString + "/t"
    val prep = Decontaminate.prepare(bench, n = 4)
    try {
      val sink = Decontaminate.sink(prep, dir)
      sink(corpus.filter($"doc_id" === 6), 0L) // clean → version 0
      val v0 = SnapshotTable.versions(spark, dir).max
      sink(corpus.filter($"doc_id" === 1), 1L) // contaminated → dropped whole
      assert(SnapshotTable.versions(spark, dir).max == v0)
      sink(corpus.filter($"doc_id" === 3), 2L) // clean again → new version
      assert(SnapshotTable.versions(spark, dir).max > v0)
      val landed = SnapshotTable.read(spark, dir).select($"doc_id").as[Long].collect().sorted
      assert(landed.toSeq == Seq(3L, 6L))
    } finally prep.release()
  }

  test("appId sink: a crash-replayed batch appends NOTHING (exactly-once)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdecon3").toString + "/t"
    val prep = Decontaminate.prepare(bench, n = 4)
    try {
      val sink = Decontaminate.sink(prep, dir, appId = Some("decon-eo"))
      sink(corpus.filter($"doc_id" <= 3), 0L)
      val v0 = SnapshotTable.versions(spark, dir).max
      val rows0 = SnapshotTable.read(spark, dir).select($"doc_id").as[Long].collect().sorted.toSeq
      // forced re-delivery of the SAME batch: no duplicate rows, no version
      sink(corpus.filter($"doc_id" <= 3), 0L)
      assert(SnapshotTable.versions(spark, dir).max == v0)
      assert(SnapshotTable.read(spark, dir).select($"doc_id")
        .as[Long].collect().sorted.toSeq == rows0)
      // the NEXT batch still lands
      sink(corpus.filter($"doc_id" > 3), 1L)
      val all = SnapshotTable.read(spark, dir).select($"doc_id").as[Long].collect().sorted.toSeq
      assert(all == Seq(3L, 4L, 6L), s"got $all") // 1, 2, 5 contaminated
      // replaying batch 1 after batch 1 committed: still a no-op
      sink(corpus.filter($"doc_id" > 3), 1L)
      assert(SnapshotTable.read(spark, dir).count() == 3)
    } finally prep.release()
  }
}
