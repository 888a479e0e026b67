package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.StreamingDedup

/** Streaming near-dup candidates must agree with the batch banded-LSH
  * pipeline — same signatures, same banding semantics — while finding
  * pairs ACROSS micro-batches through bucket state.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  /** A corpus with planted near-dup families: `n` base docs, every third
    * doc gets a twin differing by one appended token (high but not full
    * Jaccard overlap), plus one exact duplicate pair.
    */
  private def corpus(n: Int): Seq[(Long, String)] = {
    def words(seed: Long, len: Int): String = {
      val r = new scala.util.Random(seed)
      Seq.fill(len)("tok" + r.nextInt(500)).mkString(" ")
    }
    val base = (0 until n).map(i => (i.toLong, words(i * 7L + 1, 30)))
    val twins = (0 until n by 3).map(i =>
      ((1000 + i).toLong, base(i)._2 + " extra" + i))
    val exact = Seq(((2000).toLong, base(1)._2))
    base ++ twins ++ exact
  }

  private def batchPairs(docs: Seq[(Long, String)]): Set[(Long, Long)] =
    Dedup.minHashNearDups(docs.toDF("doc_id", "text"), threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet

  test("batch-mode parity: same candidate set as Dedup.minHashNearDups") {
    val docs = corpus(24)
    val got = StreamingDedup.nearDupCandidates(docs.toDF("doc_id", "text"))
      .collect().map(p => (p.id_a, p.id_b)).toSet
    val want = batchPairs(docs)
    assert(want.nonEmpty, "corpus must plant near-dups")
    assert(got == want, s"only-stream=${got -- want} only-batch=${want -- got}")
  }

  test("streaming: cross-batch pairs surface through bucket state; re-delivery is a no-op") {
    val docs = corpus(24)
    // split so several planted (base, twin) pairs straddle the batch line
    val (b1, b2) = docs.partition(_._1 % 2 == 0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupCandidates(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sdedup_out").outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // re-deliver batch 2 verbatim: ids already sit in their buckets, so
      // nothing new may be emitted
      val before = spark.table("sdedup_out").count()
      mem.addData(b2: _*); q.processAllAvailable()
      assert(spark.table("sdedup_out").count() == before,
        "re-delivered docs must not re-emit pairs")
      val got = spark.table("sdedup_out")
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
      val want = batchPairs(docs)
      val crossBatch = want.filter { case (a, b) =>
        (a % 2 == 0) != (b % 2 == 0) || Seq(a, b).exists(_ >= 1000) }
      assert(crossBatch.nonEmpty, "split must leave cross-batch pairs")
      assert(got == want, s"only-stream=${got -- want} only-batch=${want -- got}")
    } finally q.stop()
  }

  test("threshold 0.0 emits every bucket-colliding pair — the verified-dedup candidate semantics") {
    // with the estimate filter off, the candidate set must equal the batch
    // banded path's UNFILTERED collisions (minHashNearDups at threshold 0),
    // which is what exact verification (q150 / minHashVerifiedNearDups)
    // expects as input: a borderline pair whose exact Jaccard clears the
    // cut but whose 64-sample estimate does not must still be emitted
    val docs = corpus(24)
    val got = StreamingDedup.nearDupCandidates(docs.toDF("doc_id", "text"), threshold = 0.0)
      .collect().map(p => (p.id_a, p.id_b)).toSet
    val want = Dedup.minHashNearDups(docs.toDF("doc_id", "text"), threshold = 0.0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(want.nonEmpty && got == want,
      s"only-stream=${got -- want} only-batch=${want -- got}")
    // and the unfiltered set strictly contains the 0.5-estimate set
    assert(batchPairs(docs).subsetOf(got))
  }

  test("est_jaccard matches the batch estimate and the exact pair scores") {
    val docs = corpus(12)
    val got = StreamingDedup.nearDupCandidates(docs.toDF("doc_id", "text"))
      .collect().map(p => ((p.id_a, p.id_b), p.est_jaccard)).toMap
    val want = Dedup.minHashNearDups(docs.toDF("doc_id", "text"), threshold = 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, e) => ((a, b), e) }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, e) =>
      assert(math.abs(e - want(k)) < 1e-9, s"$k: stream $e vs batch ${want(k)}") }
    // the exact duplicate pair estimates 1.0
    assert(got.collect { case ((1L, 2000L), e) => e }.forall(_ == 1.0))
  }

  test("retention: emitted pairs equal the batch set restricted to the event-time window") {
    // ids 0..23 with event times 100s apart; retention 250s → only pairs
    // whose planted twins sit within 2-3 steps stay in-window. Timestamps
    // advance monotonically across batches so no pair straddles a
    // watermark-evicted partner (the orderly-ingest contract).
    val docs = corpus(24)
    // order docs so each twin follows its base (Δts one step → in-window)
    // while the planted exact dup (2000, twin of base 1) lands at the END
    // (Δts far past retention → its pair must drop)
    val byId = docs.toMap
    val ordered = (0L until 24L).flatMap(i =>
      Seq(i) ++ (if (i % 3 == 0) Seq(1000L + i) else Nil)) :+ 2000L
    val ts: Map[Long, Long] = ordered.zipWithIndex
      .map { case (id, i) => id -> (1700000000000L + i * 100000L) }.toMap
    val rows = ordered.map(id => (id, byId(id), new java.sql.Timestamp(ts(id))))
    val retention = java.time.Duration.ofMillis(250000L)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingDedup.nearDupCandidates(
        mem.toDF.toDF("doc_id", "text", "event_ts"), retention = Some(retention))
      .writeStream.format("memory").queryName("sdedup_ttl").outputMode("append").start()
    try {
      rows.grouped(9).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      val got = spark.table("sdedup_ttl")
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
      val want = batchPairs(docs).filter { case (a, b) =>
        math.abs(ts(a) - ts(b)) <= retention.toMillis }
      val dropped = batchPairs(docs) -- want
      assert(want.nonEmpty && dropped.nonEmpty,
        "fixture must keep some pairs in-window and push others out")
      assert(got == want, s"only-stream=${got -- want} only-batch=${want -- got}")
    } finally q.stop()

    // batch mode applies the same window rule (no watermark machinery)
    val batchGot = StreamingDedup.nearDupCandidates(
        rows.toDF("doc_id", "text", "event_ts"), retention = Some(retention))
      .collect().map(p => (p.id_a, p.id_b)).toSet
    assert(batchGot == batchPairs(docs).filter { case (a, b) =>
      math.abs(ts(a) - ts(b)) <= retention.toMillis })
  }

  test("retention: bucket state is measured bounded — old buckets evict and time out") {
    // each batch carries DISTINCT fresh texts (fresh buckets) with event
    // time jumping far past retention: old buckets' entries expire and the
    // event-time timeout removes the emptied buckets, so total state rows
    // stay ~one batch's buckets instead of accumulating across batches
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def batchDocs(b: Int): Seq[(Long, String, java.sql.Timestamp)] =
      (0 until 6).map { i =>
        val id = b * 100L + i
        (id, s"uniq$b-$i alpha$b beta$i gamma${b * 7 + i} delta$i epsi$b zeta$i",
          new java.sql.Timestamp(1700000000000L + b * 3600L * 1000))
      }
    def run(retention: Option[java.time.Duration]): Long = {
      val name = s"sdedup_state_${retention.isDefined}"
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = StreamingDedup.nearDupCandidates(
          mem.toDF.toDF("doc_id", "text", "event_ts"),
          retention = retention)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        (0 until 6).foreach { b => mem.addData(batchDocs(b): _*); q.processAllAvailable() }
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      } finally q.stop()
    }
    val withTtl = run(Some(java.time.Duration.ofMinutes(10)))
    val without = run(None)
    // no-TTL keeps every bucket ever created (~6 batches × 6 docs × 16
    // bands, minus rare cross-doc band collisions); TTL holds at most the
    // last two batches' worth (watermark lags one batch)
    assert(without >= 5 * 6 * 16, s"no-TTL state rows: $without")
    assert(withTtl <= 2 * 6 * 16, s"TTL state rows not bounded: $withTtl vs $without")
  }

  test("cap-evicted ids stay no-ops through tombstones") {
    // cap=2 with 5 identical docs: ids 0,1,2 evict from the signature list
    // after batch 1; re-delivering them must emit nothing new
    val docs = (0L until 5L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupCandidates(
        mem.toDF.toDF("doc_id", "text"), maxPerBucket = 2)
      .writeStream.format("memory").queryName("sdedup_tomb").outputMode("append").start()
    try {
      mem.addData(docs: _*); q.processAllAvailable()
      val before = spark.table("sdedup_tomb").count()
      assert(before > 0)
      mem.addData(docs.take(3): _*); q.processAllAvailable()
      assert(spark.table("sdedup_tomb").count() == before,
        "re-delivered cap-evicted ids must not re-emit pairs")
    } finally q.stop()
  }

  test("bucket cap bounds state while keeping new arrivals colliding") {
    // 40 identical docs through cap=4: every arrival still collides with
    // retained bucket-mates, state stays bounded
    val docs = (0L until 40L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupCandidates(
        mem.toDF.toDF("doc_id", "text"), maxPerBucket = 4)
      .writeStream.format("memory").queryName("sdedup_cap").outputMode("append").start()
    try {
      docs.grouped(10).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      val pairs = spark.table("sdedup_cap")
        .select(col("id_a"), col("id_b")).distinct().as[(Long, Long)].collect()
      // every doc after the first participates in at least one pair
      val touched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      assert((0L until 40L).forall(touched.contains),
        s"docs missing from all pairs: ${(0L until 40L).filterNot(touched.contains)}")
    } finally q.stop()
  }

  test("hot-bucket alarm: occupancy reads the query's own state; boilerplate skews, diverse reads ~1x") {
    // the LSH tier's drift-equivalent readout: a boilerplate-heavy stream
    // (half the docs share one template) concentrates into 16 hot band
    // buckets while diverse text spreads one doc per bucket
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def uniq(i: Long): String = {
      val r = new scala.util.Random(i * 31L + 5)
      Seq.fill(30)("tok" + r.nextInt(100000)).mkString(" ")
    }
    val template = "the quick brown fox jumps over the lazy dog again and again " * 3
    val boilerplated: Seq[(Long, String)] =
      (0L until 40L).map(i => (i, template)) ++ (100L until 140L).map(i => (i, uniq(i)))
    val diverse: Seq[(Long, String)] = (0L until 80L).map(i => (i, uniq(1000 + i)))
    def runAndMeasure(docs: Seq[(Long, String)], tag: String): Double = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-sd-occ-$tag").toString
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDedup.nearDupCandidates(mem.toDF.toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(s"sdedup_occ_$tag")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try { mem.addData(docs: _*); q.processAllAvailable() } finally q.stop()
      val occ = StreamingDedup.bucketOccupancy(spark, ckpt)
      // every doc occupies one bucket per band (cap not hit): exact total
      assert(occ.agg(sum($"retained")).head().getLong(0) == docs.length * 16L)
      StreamingDedup.bucketSkew(occ)
    }
    val hot = runAndMeasure(boilerplated, "hot")
    val flat = runAndMeasure(diverse, "flat")
    assert(hot >= 8.0, f"boilerplate stream should read hot buckets: skew $hot%.2f")
    assert(flat <= 2.5, f"diverse stream should read near-balanced: skew $flat%.2f")
  }

  test("retention-evicted ids stay no-ops through tombstones; occupancy reports them") {
    // ids 0,1 pair inside the window, then age out of retention as later
    // same-bucket docs arrive (eviction happens ON the data path, so the
    // bucket's tombstones persist); re-delivering 0,1 afterwards must not
    // re-enter state or re-emit the pair — pre-fix they re-paired
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def at(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sd-ttltomb").toString
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingDedup.nearDupCandidates(
        mem.toDF.toDF("doc_id", "text", "event_ts"),
        retention = Some(java.time.Duration.ofSeconds(100)))
      .writeStream.format("memory").queryName("sdedup_ttltomb")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      mem.addData((0L, text, at(0)), (1L, text, at(50))); q.processAllAvailable()
      mem.addData((2L, text, at(5000))); q.processAllAvailable()  // wm 50s: 0,1 live
      mem.addData((3L, text, at(10000))); q.processAllAvailable() // wm 5000s: 0,1 evict+tombstone
      val before = spark.table("sdedup_ttltomb")
        .select(col("id_a"), col("id_b")).distinct().as[(Long, Long)].collect().toSet
      assert(before == Set((0L, 1L)), s"only the in-window pair should emit: $before")
      // re-delivery of the evicted ids (their window long closed)
      mem.addData((0L, text, at(0)), (1L, text, at(50))); q.processAllAvailable()
      val after = spark.table("sdedup_ttltomb")
        .select(col("id_a"), col("id_b")).distinct().as[(Long, Long)].collect().toSet
      assert(after == before, s"re-delivered evicted ids re-emitted: ${after -- before}")
    } finally q.stop()
    // the state store shows the eviction: per band bucket all 4 docs stay
    // accounted for, with (at least) the two retention-evicted ids held as
    // tombstones rather than re-entered signatures (the exact retained
    // split depends on how far the watermark had advanced at the last
    // processed batch — it lags the data by one batch)
    val occ = StreamingDedup.bucketOccupancy(spark, ckpt)
      .select($"retained", $"tombstones").as[(Int, Int)].collect()
    assert(occ.length == 16 && occ.forall { case (r, t) => r + t == 4 && t >= 2 },
      s"expected 16 buckets with 4 accounted docs and >=2 tombstones: ${occ.toSeq.distinct}")
  }
}
