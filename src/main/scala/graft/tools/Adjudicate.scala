package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.{Sessions, SparkEntry, Tables}

/** Regression-vs-noise discriminator for the per-round bench adjudication
  * (the judge's "10 flat reps + shuffle-byte identity" protocol): runs the
  * queries named in SPARK_GRAFT_QUERIES — or EVERY registered query when
  * the variable is unset/empty (the all-queries quiet-vector mode) — for
  * SPARK_GRAFT_BENCH_REPS reps (default 10 targeted / 5 all-queries)
  * against SPARK_GRAFT_SF_DIR, recording per-rep wall seconds AND per-rep
  * shuffle-write bytes from a task-end listener. Two code states producing
  * identical shuffle-byte vectors on the same inputs ran the same physical
  * work — any wall-clock delta between them is box state, not a plan
  * change. Prints one JSON line per query plus a trailing loadavg line;
  * compare runs of this tool built at the two commits under adjudication
  * (or diff two committed BENCH_DETAIL.json artifacts, which carry the
  * same byte vectors since r19).
  */
object Adjudicate {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val named = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = named.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // all-queries mode sweeps the whole registry in name order at fewer
    // reps — the committed quiet vector's shape (every query × 5 reps)
    val names = if (named.nonEmpty) named else SparkEntry.queries.keys.toSeq.sorted
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt)
      .getOrElse(if (named.nonEmpty) 10 else 5)

    val spark = Sessions.local(Sessions.coresFromEnv, appName = "graft-adjudicate")
    try {
      Seq("lineitem", "documents", "embeddings")
        .foreach(t => Tables.load(spark, sfDir, t).limit(1).count())
      Tables.events(spark, sfDir).limit(1).count()

      val shuffleW = new LongAdder
      val events = new LongAdder
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          if (t.taskMetrics != null)
            shuffleW.add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          events.increment()
        }
      }
      // the listener bus is async: poll the event count to stability OUTSIDE
      // the timed window (same settle protocol as ScaleSoakSpec.measureOnce)
      def settle(): Unit = {
        var last = -1L
        var stable = 0
        while (stable < 3) {
          Thread.sleep(150)
          val n = events.sum()
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        // drain warmup events before the first rep's reset (the Bench
        // discipline: a late warmup task-end must not inflate vector 0)
        settle()
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          // per-query isolation: one throwing query must not abort the
          // rest of an all-queries sweep (nor lose the loadavg marker) —
          // it reports as an err line and the sweep continues
          try {
            val samples = (1 to reps).map { _ =>
              shuffleW.reset()
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.mode("overwrite").format("noop").save()
              val sec = (System.nanoTime() - t0) / 1e9
              settle()
              spark.catalog.clearCache()
              SparkEntry.clearMemos()
              (sec, shuffleW.sum())
            }
            def j(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
            println(s"""{"query":"$name","secs":[${samples.map(s => j(s._1)).mkString(",")}],""" +
              s""""shuffle_bytes":[${samples.map(_._2).mkString(",")}]}""")
          } catch {
            case e: Throwable =>
              // drain the failed query's still-in-flight task-end events
              // BEFORE the next query's first-rep shuffleW.reset() — a late
              // event landing after the reset would nondeterministically
              // inflate the next byte vector, the exact noise the
              // byte-identity protocol exists to exclude
              settle()
              spark.catalog.clearCache()
              SparkEntry.clearMemos()
              val msg = String.valueOf(e.getMessage).replaceAll("[\"\\\\\n\r]", " ").take(200)
              println(s"""{"query":"$name","err":"$msg"}""")
          }
        }
        // best-effort box-state marker: /proc/loadavg is Linux-only, and a
        // completed benchmark must not throw over a missing pseudo-file
        val load = scala.util.Try(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim).getOrElse("")
        println(s"""{"loadavg_end":"$load"}""")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally spark.stop()
  }
}
