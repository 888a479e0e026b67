package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.multimodal.Multimodal

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: known vectors") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 1.0f), Seq(1.0f, 0.0f), math.sqrt(2) / 2),
      (Seq(0.0f, 0.0f), Seq(1.0f, 0.0f), 0.0) // zero-norm guard
    ).toDF("a", "b", "expected")
    val bad = df.filter(abs(Similarity.cosine(col("a"), col("b")) - col("expected")) > 1e-9)
    assert(bad.count() == 0)
  }

  test("bruteForceTopK returns k best neighbors, self excluded, ranked") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val c = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val out = Similarity.bruteForceTopK(q, c, k = 5).orderBy("rank")
      .select("neighbor_id", "score").as[(Long, Double)].collect()
    assert(out.length == 5)
    assert(!out.map(_._1).contains(0L)) // no self
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted.reverse) // descending
  }

  test("lshTopK achieves reasonable recall vs brute force") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val c = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val brute = Similarity.bruteForceTopK(q, c, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(q, c, dim = 64, k = 3, bits = 16, bands = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall") // 8 bands of 2 bits probe aggressively
  }

  test("lshTopK boundary: bits=64/bands=1 buckets on the FULL signature; bands<1 refused") {
    // (1L << 64) wraps to 1 on the JVM, so a naive width-64 mask is 0 —
    // every band value would collapse to one hot key (an all-pairs join in
    // disguise). The all-bits mask keeps one band meaning exact-signature
    // buckets: candidate pairs must share the whole 64-bit signature.
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val c = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val out = Similarity.lshTopK(q, c, dim = 64, k = 3, bits = 64, bands = 1)
    // exact-signature buckets are sparse: candidates (if any) are a tiny
    // fraction of the 5 x N cross product — the degenerate mask would have
    // returned k rows for EVERY query through one hot key
    assert(out.count() <= 15)
    // 16 % -1 == 0 passes a bare divisibility check; it must refuse loudly
    // instead of silently emitting zero rows
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(q, c, dim = 64, k = 3, bits = 16, bands = -1)
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeInt8: range, exact max hit, reconstruction error <= scale/2, zero-vector safe") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 0.0)),
      (2L, Seq(3.0, 2.0, -3.0, 1.5)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0))) // zero vector
      .toDF("id", "v")
    val q = Similarity.quantizeInt8(vecs, "v")
    val rows = q.orderBy("id").collect()
    for (r <- rows) {
      val v = r.getSeq[Double](1)
      val qv = r.getSeq[Long](2)
      val scale = r.getDouble(3)
      assert(qv.forall(x => x >= -127 && x <= 127), s"range: $r")
      if (v.exists(_ != 0.0)) {
        assert(qv.map(math.abs).max == 127L, s"max must quantize to ±127: $r")
        val maxErr = v.zip(qv).map { case (x, qx) => math.abs(x - qx * scale) }.max
        assert(maxErr <= scale / 2 + 1e-12, s"reconstruction error $maxErr > scale/2: $r")
      } else assert(qv.forall(_ == 0L) && scale == 0.0, s"zero vector: $r")
    }
  }

  test("extractFeatures: deterministic fake decode over binary column") {
    val media = Multimodal.asMedia(Tables.documents(spark, sfDir), "doc_id", "text", "text/plain")
    val f1 = Multimodal.extractFeatures(media).orderBy("id").collect()
    val f2 = Multimodal.extractFeatures(media, batchPartitions = Some(2)).orderBy("id").collect()
    assert(f1.length == 500)
    assert(f1.toSeq == f2.toSeq) // partitioning must not change results
    assert(f1.forall(r => r.n_bytes > 0 && r.width >= 64 && r.height >= 64))
  }

  test("sampleFrames yields stride-spaced offsets") {
    val media = Seq((1L, "x" * 250, "video/fake")).toDF("id", "payload", "t")
      .select(col("id"), encode(col("payload"), "UTF-8").as("media"), col("t").as("media_type"))
    val offs = Multimodal.sampleFrames(media, stride = 100).select("frame_offsets").as[Seq[Int]].head()
    assert(offs == Seq(0, 100, 200))
  }
}

class StreamingSpec extends SparkSpec {

  test("IncrementalStream: file-source dedup merge is idempotent across batches") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val src = s"$root/src"; val sink = s"$root/sink"; val chk = s"$root/chk"
    new java.io.File(src).mkdirs()

    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "event_type", "value", "dt")
    val schema = ev.schema
    // batch 1: first 400 events
    ev.filter(col("event_id") < 400).write.mode("overwrite").parquet(s"$src/b1")
    val q1 = graft.streaming.IncrementalStream.run(spark, s"$src/*", sink, chk, schema, Seq("event_id"))
    q1.awaitTermination()
    assert(spark.read.parquet(sink).count() == 400)

    // batch 2: overlapping range 200-600 (200-399 are re-delivered dups)
    ev.filter(col("event_id") >= 200 && col("event_id") < 600).write.mode("overwrite").parquet(s"$src/b2")
    val q2 = graft.streaming.IncrementalStream.run(spark, s"$src/*", sink, chk, schema, Seq("event_id"))
    q2.awaitTermination()
    val sinkDf = spark.read.parquet(sink)
    assert(sinkDf.count() == 600)
    assert(sinkDf.select("event_id").distinct().count() == 600)
  }

  test("IncrementalStream: the watermarked path dedups within the watermark " +
    "and the sink anti-join still absorbs cross-run re-delivery") {
    // with a watermark the in-stream dedup is dropDuplicatesWithinWatermark
    // (plain dropDuplicates would hold a state row per key FOREVER — the
    // 'bound the dedup state' contract would be a no-op); keys re-delivered
    // across runs are out of stream state entirely and must be caught by
    // the sink-side anti-join
    val root = java.nio.file.Files.createTempDirectory("graft-stream-wm").toString
    val src = s"$root/src"; val sink = s"$root/sink"; val chk = s"$root/chk"
    new java.io.File(src).mkdirs()
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts", "dt")
    val schema = ev.schema
    // batch 1 carries an in-batch duplicate pair of event_ids (union of an
    // overlapping slice): within-watermark dedup must collapse them
    ev.filter(col("event_id") < 300)
      .union(ev.filter(col("event_id") >= 250 && col("event_id") < 300))
      .write.mode("overwrite").parquet(s"$src/b1")
    val q1 = graft.streaming.IncrementalStream.run(spark, s"$src/*", sink, chk,
      schema, Seq("event_id"), watermark = Some(("ts", "1 hour")))
    q1.awaitTermination()
    assert(spark.read.parquet(sink).count() == 300)
    // cross-run re-delivery (200-499): 200-299 already in the sink
    ev.filter(col("event_id") >= 200 && col("event_id") < 500)
      .write.mode("overwrite").parquet(s"$src/b2")
    val q2 = graft.streaming.IncrementalStream.run(spark, s"$src/*", sink, chk,
      schema, Seq("event_id"), watermark = Some(("ts", "1 hour")))
    q2.awaitTermination()
    val sinkDf = spark.read.parquet(sink)
    assert(sinkDf.count() == 500)
    assert(sinkDf.select("event_id").distinct().count() == 500)
  }
}
