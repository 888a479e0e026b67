package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.catalog.SnapshotTable
import graft.text.TextPipelines

/** Select-on-ingest: prepared frozen DSIR models must score the fit corpus
  * exactly like the one-shot path (exact AND hashed feature spaces), unseen
  * features must land on the smoothing floor, and the `foreachBatch` sink
  * must append exactly the batch threshold selection — streamed in any
  * batching, with all-rejected batches publishing no version.
  */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  private val raw = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta other words"),
    (3L, "completely different text body"),
    (4L, "alpha beta gamma tail"),
    (5L, "single"),
    (6L, "different text body again here")
  ).toDF("doc_id", "text")

  private val target = raw.filter($"doc_id" <= 2 || $"doc_id" === 4)

  test("prepared scores EQUAL the one-shot path on the fit corpus (exact and hashed)") {
    val exact = TextPipelines.dsirPrepare(raw, target)
    try {
      val a = TextPipelines.dsirScorePrepared(raw, exact).orderBy($"doc_id").collect().toSeq
      val b = TextPipelines.dsirScores(raw, target).orderBy($"doc_id").collect().toSeq
      assert(a == b)
    } finally exact.release()
    val hashed = TextPipelines.dsirPrepare(raw, target, hexChars = Some(2))
    try {
      val a = TextPipelines.dsirScorePrepared(raw, hashed).orderBy($"doc_id").collect().toSeq
      val b = TextPipelines.dsirScoresHashed(raw, target, hexChars = 2)
        .orderBy($"doc_id").collect().toSeq
      assert(a == b)
    } finally hashed.release()
  }

  test("a feature the frozen models never saw scores at the smoothing floor") {
    val m = TextPipelines.dsirPrepare(raw, target)
    try {
      val got = TextPipelines.dsirScorePrepared(
        Seq((99L, "utterly unseen bigrams only")).toDF("doc_id", "text"), m)
        .as[(Long, Long, Double)].collect().head
      val k = m.addK
      val floor = math.log(k / (m.nT + m.v * k)) - math.log(k / (m.nR + m.v * k))
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got._2 == 3L)
      assert(got._3 == r6(floor), s"got ${got._3}, floor $floor")
    } finally m.release()
  }

  test("sink appends exactly the batch threshold selection, streamed in halves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdsir").toString + "/t"
    val m = TextPipelines.dsirPrepare(raw, target)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val minScore = 0.0
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        TextPipelines.dsirSink(m, dir, minScore)(b.toDF(), id)
      }
      .start()
    try {
      val rows = raw.as[(Long, String)].collect().toSeq
      val (b1, b2) = rows.partition(_._1 % 2 == 0)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally { q.stop(); m.release() }
    val want = {
      val m2 = TextPipelines.dsirPrepare(raw, target)
      try TextPipelines.dsirScorePrepared(raw, m2)
        .filter($"dsir_score" >= minScore).select($"doc_id")
        .as[Long].collect().toSet
      finally m2.release()
    }
    assert(want.nonEmpty && want.size < 6, s"fixture degenerate: $want")
    val landed = SnapshotTable.read(spark, dir).select($"doc_id").as[Long].collect().toSet
    assert(landed == want)
  }

  test("an all-rejected batch publishes NO version") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdsir2").toString + "/t"
    val m = TextPipelines.dsirPrepare(raw, target)
    try {
      TextPipelines.dsirSink(m, dir, minScore = 1e9)(raw, 0L)
      assert(!SnapshotTable.exists(spark, dir))
      TextPipelines.dsirSink(m, dir, minScore = -1e9)(raw, 1L)
      val v = SnapshotTable.versions(spark, dir).max
      TextPipelines.dsirSink(m, dir, minScore = 1e9)(raw, 2L)
      assert(SnapshotTable.versions(spark, dir).max == v)
    } finally m.release()
  }

  test("appId sink: a crash-replayed batch appends NOTHING (exactly-once)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdsir3").toString + "/t"
    val m = TextPipelines.dsirPrepare(raw, target)
    try {
      val sink = TextPipelines.dsirSink(m, dir, minScore = -1e9, appId = Some("dsir-eo"))
      val (b1, b2) = (raw.filter($"doc_id" % 2 === 0), raw.filter($"doc_id" % 2 =!= 0))
      sink(b1, 0L)
      val v0 = SnapshotTable.versions(spark, dir).max
      val n0 = SnapshotTable.read(spark, dir).count()
      assert(n0 > 0)
      // forced re-delivery: no duplicate rows, no extra version
      sink(b1, 0L)
      assert(SnapshotTable.versions(spark, dir).max == v0)
      assert(SnapshotTable.read(spark, dir).count() == n0)
      // next batch lands; replaying it is again a no-op
      sink(b2, 1L)
      val nAll = SnapshotTable.read(spark, dir).count()
      assert(nAll > n0)
      sink(b2, 1L)
      assert(SnapshotTable.read(spark, dir).count() == nAll)
    } finally m.release()
  }
}
