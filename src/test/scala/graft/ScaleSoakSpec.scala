package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Similarity

/** Empirical scaling evidence for the heavy pipelines: run each at 1× and
  * 4× input and require near-linear growth in time and shuffle volume with
  * ZERO disk spill — the measured counterpart of the "would this survive
  * 100×?" plan arguments. Metrics come from a SparkListener (per-task
  * shuffle write bytes, spill, peak execution memory), not wall-clock
  * guesswork alone.
  *
  * Env-gated (slow): runs only with SPARK_GRAFT_SOAK=1, e.g.
  * `SPARK_GRAFT_SOAK=1 sbt 'testOnly graft.ScaleSoakSpec'`. Time bounds are
  * deliberately loose (6× for 4× data, min of 2 reps) because the box is
  * co-tenant; the shuffle-byte and spill assertions are exact.
  */
class ScaleSoakSpec extends SparkSpec {
  import spark.implicits._

  private val enabled = sys.env.get("SPARK_GRAFT_SOAK").contains("1")
  private val sf01 = "/root/testdata/sf0.1"
  private lazy val soakRoot = java.nio.file.Files.createTempDirectory("graft-soak").toString

  private case class RunMetrics(sec: Double, shuffleWriteBytes: Long,
      diskSpill: Long, memSpill: Long, peakMem: Long) {
    def pretty: String =
      f"$sec%.2fs shuffleW=${shuffleWriteBytes / 1e6}%.1fMB diskSpill=$diskSpill%d " +
        f"memSpill=${memSpill / 1e6}%.1fMB peakTaskMem=${peakMem / 1e6}%.1fMB"
  }

  /** Run the action twice, collecting task metrics; keep the faster rep
    * (robust to one co-tenant hiccup — both reps being inflated is rarer).
    */
  private def measure(run: () => Unit): RunMetrics = {
    def once(): RunMetrics = {
      val acc = new java.util.concurrent.atomic.AtomicReference(
        (0L, 0L, 0L, 0L, 0)) // (shufW, disk, mem, peak, events)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null) acc.updateAndGet { case (w, d, m, p, n) =>
            (w + t.taskMetrics.shuffleWriteMetrics.bytesWritten,
              d + t.taskMetrics.diskBytesSpilled,
              m + t.taskMetrics.memoryBytesSpilled,
              math.max(p, t.taskMetrics.peakExecutionMemory), n + 1)
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try {
        run()
        // listener bus is async — wait for quiet
        var last = -1
        var stable = 0
        while (stable < 3) {
          Thread.sleep(150)
          val n = acc.get()._5
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      val sec = (System.nanoTime() - t0) / 1e9
      val (w, d, m, p, _) = acc.get()
      spark.catalog.clearCache()
      SparkEntry.clearMemos()
      RunMetrics(sec, w, d, m, p)
    }
    val reps = Seq(once(), once())
    reps.minBy(_.sec)
  }

  private def assertScaling(name: String, m1: RunMetrics, m4: RunMetrics): Unit = {
    info(s"$name 1x: ${m1.pretty}")
    info(s"$name 4x: ${m4.pretty}")
    assert(m4.diskSpill == 0L, s"$name spilled ${m4.diskSpill} bytes to disk at 4x")
    assert(m4.sec <= 6.0 * math.max(m1.sec, 0.5),
      f"$name time superlinear: 1x ${m1.sec}%.2fs -> 4x ${m4.sec}%.2fs")
    assert(m4.shuffleWriteBytes <= 6L * math.max(m1.shuffleWriteBytes, 1L << 20),
      s"$name shuffle superlinear: ${m1.shuffleWriteBytes} -> ${m4.shuffleWriteBytes}")
  }

  /** `factor`× the sf0.1 documents: replica i suffixes EVERY token with
    * `~i`, so replicas share no terms (and no shingles) with each other —
    * a token shuffle is NOT enough, because SimHash/cosine are bag-of-words
    * operators and would see shuffled replicas as exact duplicates, making
    * pair counts quadratic in the factor by fixture construction. One
    * genuine " zz"-perturbed twin per doc keeps the verify stage scaling
    * with input. Written to parquet once so every measured run starts from
    * a real scan.
    */
  private def scaledDocs(factor: Int): DataFrame = {
    val path = s"$soakRoot/docs_x$factor"
    if (!new java.io.File(path).exists()) {
      val base = Tables.documents(spark, sf01).select(col("doc_id"), col("text"))
      val reps = (0 until factor).map { i =>
        if (i == 0) base
        else base.as[(Long, String)].map { case (id, text) =>
          (id + i * 10000000L, text.split(' ').map(t => s"$t~$i").mkString(" "))
        }.toDF("doc_id", "text")
      }
      val all = reps.reduce(_ unionByName _)
      all.unionByName(all.select((col("doc_id") + 500000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
        .repartition(32).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** `factor`× the sf0.1 embeddings with per-replica direction noise so
    * clones don't collapse into identical directions.
    */
  private def scaledVecs(factor: Int): DataFrame = {
    val path = s"$soakRoot/vecs_x$factor"
    if (!new java.io.File(path).exists()) {
      val base = Tables.embeddings(spark, sf01)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val reps = (0 until factor).map { i =>
        if (i == 0) base
        else base.select((col("id") + i * 10000000L).as("id"),
          transform(col("vec"),
            (x, j) => x + sin((col("id") + 1) * (j + 1) * lit(i * 0.7))).as("vec"))
      }
      reps.reduce(_ unionByName _).repartition(32).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  private def scaledLineitem(factor: Int): DataFrame = {
    val base = Tables.lineitem(spark, sf01).select("l_returnflag", "l_extendedprice")
    (0 until factor).map { i =>
      if (i == 0) base
      else base.withColumn("l_extendedprice", col("l_extendedprice") + lit(i * 0.01))
    }.reduce(_ unionByName _)
  }

  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  test("soak: MinHash-LSH near-dup pipeline scales near-linearly, no disk spill") {
    assume(enabled, "set SPARK_GRAFT_SOAK=1 to run the scale soak")
    noop(Dedup.minHashVerifiedNearDups(scaledDocs(1), threshold = 0.5)) // warm-up
    val m1 = measure(() => noop(Dedup.minHashVerifiedNearDups(scaledDocs(1), threshold = 0.5)))
    val m4 = measure(() => noop(Dedup.minHashVerifiedNearDups(scaledDocs(4), threshold = 0.5)))
    assertScaling("minhash", m1, m4)
  }

  test("soak: SimHash-cosine near-dup pipeline scales near-linearly, no disk spill") {
    assume(enabled, "set SPARK_GRAFT_SOAK=1 to run the scale soak")
    val m1 = measure(() => noop(Dedup.simHashCosineNearDups(scaledDocs(1))))
    val m4 = measure(() => noop(Dedup.simHashCosineNearDups(scaledDocs(4))))
    assertScaling("simhash", m1, m4)
  }

  test("soak: IVF ANN scales near-linearly in corpus size, no disk spill") {
    assume(enabled, "set SPARK_GRAFT_SOAK=1 to run the scale soak")
    def queriesFrom(c: DataFrame) = c.filter(col("id") < 20)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val c1 = scaledVecs(1)
    val c4 = scaledVecs(4)
    val m1 = measure(() => noop(Similarity.ivfTopK(queriesFrom(c1), c1, dim = 64, k = 5)))
    val m4 = measure(() => noop(Similarity.ivfTopK(queriesFrom(c4), c4, dim = 64, k = 5)))
    assertScaling("ivf", m1, m4)
  }

  test("soak: exact quantiles scale near-linearly, no disk spill") {
    assume(enabled, "set SPARK_GRAFT_SOAK=1 to run the scale soak")
    val m1 = measure(() => noop(graft.ops.Quantiles.exactQuantiles(
      scaledLineitem(1), "l_extendedprice", Seq("l_returnflag"),
      Seq(0.05, 0.5, 0.95), Seq("lo", "med", "hi"))))
    val m4 = measure(() => noop(graft.ops.Quantiles.exactQuantiles(
      scaledLineitem(4), "l_extendedprice", Seq("l_returnflag"),
      Seq(0.05, 0.5, 0.95), Seq("lo", "med", "hi"))))
    assertScaling("quantiles", m1, m4)
  }
}
