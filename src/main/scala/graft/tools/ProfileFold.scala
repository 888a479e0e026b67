package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.IncrementalClusters

/** Disposable profiling driver for the q151 fold path (not part of the
  * library surface): times pair generation vs each of the three folds so
  * the fixed per-fold commit overhead is visible in isolation.
  */
object ProfileFold {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("profile-fold").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.Tables.documents(spark, sf)
      .withColumn("near_dup_of",
        when(pmod(col("doc_id"), lit(10)) === 1, col("doc_id") - 1))
    val corpus = docs // near-dup structure from the raw table is enough for timing
    val pairs = t("pairs (minhash+verify)") {
      val p = Dedup.minHashVerifiedNearDups(corpus, threshold = 0.5)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      System.err.println(s"[prof]   pairs=${p.count()}")
      p
    }
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    var traceJobs = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(je.jobId)
        if (traceJobs && s != null)
          System.err.println(f"[prof]     job ${je.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%.3f s  ${s._2.take(90)}")
      }
    })
    (1 to 2).foreach { round =>
      val tbl = java.nio.file.Files.createTempDirectory(s"graft-prof$round").toString
      traceJobs = round == 2
      (0 until 3).foreach { c =>
        t(s"r$round fold$c") {
          IncrementalClusters.foldPairs(spark, tbl,
            pairs.filter(pmod(col("id_a") + col("id_b"), lit(3)) === c))
        }
      }
    }
    // stage brackets: an instrumented replica of the fold body
    locally {
      import graft.catalog.SnapshotTable
      val tbl = java.nio.file.Files.createTempDirectory("graft-prof3").toString
      traceJobs = false
      IncrementalClusters.foldPairs(spark, tbl,
        pairs.filter(pmod(col("id_a") + col("id_b"), lit(3)) === 0))
      Seq(1, 2).foreach { c =>
        val newEdges = pairs.filter(pmod(col("id_a") + col("id_b"), lit(3)) === c)
          .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
        t(s"  f$c exists+isEmpty") {
          SnapshotTable.exists(spark, tbl) && !newEdges.isEmpty
        }
        val prev = t(s"  f$c read+persist") {
          val p = SnapshotTable.read(spark, tbl)
            .select(col("doc_id"), col("rep_id")).persist()
          p.count(); p
        }
        val mapped = newEdges
          .join(prev.select(col("doc_id").as("id_a"), col("rep_id").as("ra")), Seq("id_a"), "left")
          .join(prev.select(col("doc_id").as("id_b"), col("rep_id").as("rb")), Seq("id_b"), "left")
          .select(coalesce(col("ra"), col("id_a")).as("id_a"),
            coalesce(col("rb"), col("id_b")).as("id_b"))
        val ccd = t(s"  f$c cc-auto") { graft.ops.Graph.connectedComponentsAuto(mapped) }
        val remap = broadcast(ccd.filter(col("id") =!= col("rep"))
          .select(col("id").as("rep_id"), col("rep").as("new_rep")))
        val newDocs = newEdges.select(col("id_a").as("doc_id"))
          .union(newEdges.select(col("id_b"))).distinct()
          .join(prev.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .join(ccd.select(col("id").as("doc_id"), col("rep").as("rep_id")), Seq("doc_id"))
        val moved = prev.join(remap, Seq("rep_id"))
          .select(col("doc_id"), col("new_rep").as("rep_id"))
        val changes = t(s"  f$c changes persist+count") {
          val ch = moved.unionByName(newDocs).persist(); ch.count(); ch
        }
        // mergeByKey stage replica: footprint collect / read+upsert+write /
        // manifest commit — bracketed separately
        val keyRows = t(s"  f$c mbk-footprint-collect") {
          changes.select(col("doc_id")).distinct().limit(100001).collect()
        }
        val m = t(s"  f$c mbk-currentManifest") {
          SnapshotTable.currentManifest(spark, tbl).get
        }
        t(s"  f$c mbk-write") {
          // approximates the rewrite: read ALL files (upper bound), anti-join
          // a local key relation, write to a scratch dir
          val base = SnapshotTable.read(spark, tbl)
          val keySchema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType, true)))
          val keyDf = spark.createDataFrame(
            java.util.Arrays.asList(keyRows: _*), keySchema)
          val out = changes.unionByName(base.join(broadcast(keyDf), Seq("doc_id"), "left_anti"))
          out.write.mode("overwrite")
            .parquet(java.nio.file.Files.createTempDirectory("graft-profw").toString)
        }
        t(s"  f$c mergeByKey(real)") {
          SnapshotTable.mergeByKey(spark, changes, tbl, "doc_id")
        }
        changes.unpersist(blocking = false); prev.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
