package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.{Sessions, SparkEntry, Tables}

/** Regression-vs-noise discriminator for the per-round bench adjudication
  * (the judge's "10 flat reps + shuffle-byte identity" protocol): runs the
  * queries named in SPARK_GRAFT_QUERIES for SPARK_GRAFT_BENCH_REPS reps
  * (default 10) against SPARK_GRAFT_SF_DIR, recording per-rep wall seconds
  * AND per-rep shuffle-write bytes from a task-end listener. Two code
  * states producing identical shuffle-byte vectors on the same inputs ran
  * the same physical work — any wall-clock delta between them is box
  * state, not a plan change. Prints one JSON line per query plus a
  * trailing loadavg line; compare runs of this tool built at the two
  * commits under adjudication.
  */
object Adjudicate {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(10)
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "SPARK_GRAFT_QUERIES must name the queries to adjudicate")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val spark = Sessions.local(Sessions.coresFromEnv, appName = "graft-adjudicate")
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
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
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
      }
      val load = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim
      println(s"""{"loadavg_end":"$load"}""")
    } finally spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
