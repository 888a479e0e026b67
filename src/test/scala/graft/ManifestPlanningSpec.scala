package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.catalog.{SnapshotCatalog, SnapshotTable}

/** Metadata-only planning over the snapshot catalog's SQL reads:
  * storage-partitioned joins (co-partitioned tables join with ZERO
  * shuffles), manifest-answered aggregates (`count(*)`/`min`/`max` as a
  * LocalTableScan — no tasks, no file reads), and runtime (DPP-style)
  * file pruning from manifest stats. Every capability is also asserted to
  * DEGRADE soundly: unprovable layouts fall back to shuffling plans,
  * inexact bounds fall back to scanning, and results stay identical
  * either way.
  */
class ManifestPlanningSpec extends SparkSpec {

  private lazy val root: String = Files.createTempDirectory("graft-mplan").toString

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snap.root", root)
  }

  // executed / collectAll / withConf come from SparkSpec — one shared
  // definition across every plan-shape spec

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    collectAll(p) { case s: ShuffleExchangeExec => s }

  private def scannedFiles(p: SparkPlan): Set[String] =
    // via the executed RDD, not `inputPartitions`: runtime (DPP) filters
    // re-plan partitions AFTER the original listing, and only the RDD
    // carries what was actually read
    collectAll(p) { case b: BatchScanExec => b }
      .flatMap(_.inputRDD.partitions).flatMap {
        case d: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          d.inputPartitions
        case _ => Seq.empty
      }.flatMap {
        case f: org.apache.spark.sql.execution.datasources.FilePartition =>
          f.files.map(_.filePath.toString)
        case _ => Seq.empty
      }.toSet

  // ---------------------------------------------- storage-partitioned join

  test("co-partitioned snapshot tables join with zero shuffles (SPJ), result-identical") {
    ensureCatalog()
    val left = spark.range(0, 2000)
      .select((col("id") % 16).as("nk"), col("id").as("lval"))
    val right = spark.range(0, 300)
      .select((col("id") % 16).as("nk"), (col("id") * 10).as("rval"))
    spark.sql("DROP TABLE IF EXISTS snap.spj.l")
    spark.sql("DROP TABLE IF EXISTS snap.spj.r")
    left.createOrReplaceTempView("spj_l_src")
    right.createOrReplaceTempView("spj_r_src")
    spark.sql("CREATE TABLE snap.spj.l PARTITIONED BY (nk) AS SELECT * FROM spj_l_src")
    spark.sql("CREATE TABLE snap.spj.r PARTITIONED BY (nk) AS SELECT * FROM spj_r_src")

    val q = "SELECT l.nk, l.lval, r.rval FROM snap.spj.l l JOIN snap.spj.r r ON l.nk = r.nk"
    val expected = left.join(right, "nk").select(col("nk"), col("lval"), col("rval"))

    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = executed(spark.sql(q))
      assert(shuffles(plan).isEmpty,
        s"expected a shuffle-free storage-partitioned join, got:\n$plan")
      val got = spark.sql(q)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    }

    // same join with SPJ off: shuffles appear, result identical — the
    // layout is an optimization, never a semantics change
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = executed(spark.sql(q))
      assert(shuffles(plan).nonEmpty)
      val got = spark.sql(q)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    }
  }

  test("SPJ on STRING identity keys: UTF8String-keyed layout joins shuffle-free") {
    ensureCatalog()
    // string identity values come back from footer stats as UTF8String
    // catalyst values; the key-grouped exec compares them against the
    // other side's — a java-String slip anywhere would break grouping
    val mk = (n: Long) => spark.range(0, n).select(
      concat(lit("grp-"), (col("id") % 12).cast("string")).as("g"), col("id").as("v"))
    spark.sql("DROP TABLE IF EXISTS snap.spj.sl")
    spark.sql("DROP TABLE IF EXISTS snap.spj.sr")
    mk(3000).createOrReplaceTempView("spj_sl_src")
    mk(240).createOrReplaceTempView("spj_sr_src")
    spark.sql("CREATE TABLE snap.spj.sl PARTITIONED BY (g) AS SELECT * FROM spj_sl_src")
    spark.sql("CREATE TABLE snap.spj.sr PARTITIONED BY (g) AS SELECT * FROM spj_sr_src")
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = "SELECT l.g, l.v, r.v AS w FROM snap.spj.sl l JOIN snap.spj.sr r ON l.g = r.g"
      val plan = executed(spark.sql(q))
      assert(shuffles(plan).isEmpty,
        s"string-keyed storage-partitioned join must be shuffle-free:\n$plan")
      val expected = mk(3000).join(
        mk(240).select(col("g"), col("v").as("w")), "g")
      val got = spark.sql(q)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    }
  }

  test("SPJ degrades to a shuffling plan when a file cannot prove a single partition value") {
    ensureCatalog()
    // an UNPARTITIONED table never derives a keyed layout
    val a = spark.range(0, 500).select((col("id") % 8).as("k"), col("id").as("v"))
    spark.sql("DROP TABLE IF EXISTS snap.spj.flat_a")
    spark.sql("DROP TABLE IF EXISTS snap.spj.flat_b")
    a.createOrReplaceTempView("spj_flat_src")
    spark.sql("CREATE TABLE snap.spj.flat_a AS SELECT * FROM spj_flat_src")
    spark.sql("CREATE TABLE snap.spj.flat_b AS SELECT * FROM spj_flat_src")
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = "SELECT x.k, count(*) AS c FROM snap.spj.flat_a x " +
        "JOIN snap.spj.flat_b y ON x.k = y.k GROUP BY x.k"
      val plan = executed(spark.sql(q))
      assert(shuffles(plan).nonEmpty, "unpartitioned tables must still shuffle")
      assert(spark.sql(q).count() == 8)
    }
  }

  test("per-file provability: with the unrouted file pruned away, the routed rest joins shuffle-free") {
    ensureCatalog()
    // bucket-partitioned fact, one commit per dt so every file carries
    // exact single-dt stats; the dt2-scoped UPDATE then rewrites ONLY
    // dt2's files into unrouted (hash-clustered, no bucket marker)
    // replacements — the classic one-bad-file layout poison
    val dir = s"$root/spjpart/fact"
    val dim = s"$root/spjpart/dim"
    def batch(dt: String, n: Long) = spark.range(0, n)
      .select((col("id") % 101).as("ck"), col("id").as("v"),
        lit(java.sql.Date.valueOf(dt)).as("dt"))
    SnapshotTable.write(spark, batch("2024-06-01", 2000), dir,
      partitionCols = Some(Seq("bucket(8,ck)")))
    SnapshotTable.append(spark, batch("2024-06-02", 2000), dir)
    SnapshotTable.write(spark,
      spark.range(0, 500).select((col("id") % 101).as("ck"), (col("id") * 7).as("w")),
      dim, partitionCols = Some(Seq("bucket(8,ck)")))

    spark.sql(s"UPDATE snap.`$dir` SET v = v + 1000000 WHERE dt = DATE'2024-06-02'")
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.exists(e => !e.path.contains("__pb_8_ck=")),
      "setup: the UPDATE must leave at least one unrouted file")
    assert(m.entries.exists(e => e.path.contains("__pb_8_ck=")),
      "setup: dt1's routed files must be carried untouched")

    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // dt1-scoped join: planning-time stats pruning drops every unrouted
      // file, the surviving set is fully provable → zero shuffles even
      // though the TABLE holds unprovable files
      val qOld = s"SELECT x.ck, x.v, y.w FROM snap.`$dir` x " +
        s"JOIN snap.`$dim` y ON x.ck = y.ck WHERE x.dt = DATE'2024-06-01'"
      val plan = executed(spark.sql(qOld))
      assert(scannedFiles(plan).filter(_.contains("/fact/")).forall(_.contains("__pb_8_ck=")),
        "the dt1 scan must read only routed files")
      assert(shuffles(plan).isEmpty,
        s"pruned-to-provable scan must keep the storage-partitioned join:\n$plan")
      val expectedOld = batch("2024-06-01", 2000)
        .join(spark.range(0, 500).select((col("id") % 101).as("ck"), (col("id") * 7).as("w")), "ck")
        .select(col("ck"), col("v"), col("w"))
      val gotOld = spark.sql(qOld)
      assert(gotOld.exceptAll(expectedOld).isEmpty && expectedOld.exceptAll(gotOld).isEmpty)

      // unscoped join reads the unrouted file → graceful shuffle fallback,
      // results stay correct
      val qAll = s"SELECT x.ck, x.v, y.w FROM snap.`$dir` x " +
        s"JOIN snap.`$dim` y ON x.ck = y.ck"
      val planAll = executed(spark.sql(qAll))
      assert(shuffles(planAll).nonEmpty,
        "a scan including the unrouted file must fall back to shuffling")
      assert(spark.sql(qAll).count() == gotOld.count() * 2,
        "both dts join completely through the mixed plan")
    }
  }

  test("fuzz: partial layouts always answer joins right; shuffle-free exactly when fully routed") {
    ensureCatalog()
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      (0 until 4).foreach { trial =>
        val nB = Seq(4, 8)(rnd.nextInt(2))
        val dir = s"$root/fuzz/t$trial"
        val dimDir = s"$root/fuzz/d$trial"
        // driver-side model: id -> v (k is always id % 97 and never updated)
        val model = scala.collection.mutable.LongMap[Long]()
        def mk(a: Long, b: Long) = {
          (a until b).foreach(i => model(i) = i)
          spark.range(a, b).select((col("id") % 97).as("k"), col("id").as("v"))
        }
        SnapshotTable.write(spark, mk(0, 1000 + rnd.nextInt(1000)), dir,
          partitionCols = Some(Seq(s"bucket($nB,k)")))
        SnapshotTable.write(spark,
          spark.range(0, 97).select(col("id").as("k"), (col("id") * 13).as("w")),
          dimDir, partitionCols = Some(Seq(s"bucket($nB,k)")))
        var hi = model.size.toLong
        (0 until 2 + rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(3) match {
            case 0 =>
              SnapshotTable.append(spark, mk(hi, hi + 300), dir); hi += 300
            case 1 =>
              // update a handful of CURRENT v values (hash-clustered
              // rewrite: the poison that used to kill the layout)
              val vs = rnd.shuffle(model.values.toSeq).take(5)
              spark.sql(s"UPDATE snap.`$dir` SET v = v + 10000000 " +
                s"WHERE v IN (${vs.mkString(",")})")
              model.foreach { case (id, v) => if (vs.contains(v)) model(id) = v + 10000000 }
            case 2 =>
              SnapshotTable.compact(spark, dir)
          }
        }
        val routed = SnapshotTable.currentManifest(spark, dir).get.entries
          .forall(_.path.contains(s"__pb_${nB}_k="))
        val q = s"SELECT t.k, t.v, d.w FROM snap.`$dir` t JOIN snap.`$dimDir` d ON t.k = d.k"
        val plan = executed(spark.sql(q))
        assert(shuffles(plan).isEmpty == routed,
          s"trial $trial (bucket $nB): fully-routed=$routed but " +
            s"${shuffles(plan).size} shuffles — SPJ must fire exactly when provable")
        val expected = model.toSeq.toDF("id", "v")
          .select((col("id") % 97).as("k"), col("v"))
          .join(spark.range(0, 97).select(col("id").as("k"), (col("id") * 13).as("w")), "k")
          .select(col("k"), col("v"), col("w"))
        val got = spark.sql(q)
        assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
          s"trial $trial: join result diverged from the model")
      }
    }
  }

  test("grouping by the partition column over a keyed layout skips the aggregate shuffle") {
    ensureCatalog()
    val src = spark.range(0, 4000)
      .select((col("id") % 10).as("g"), col("id").as("v"),
        // a second column so the aggregate is not manifest-answerable
        (col("id") * 3 % 7).as("w"))
    spark.sql("DROP TABLE IF EXISTS snap.spj.agg")
    src.createOrReplaceTempView("spj_agg_src")
    spark.sql("CREATE TABLE snap.spj.agg PARTITIONED BY (g) AS SELECT * FROM spj_agg_src")
    withConf("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val q = "SELECT g, sum(v * w) AS s FROM snap.spj.agg GROUP BY g"
      val plan = executed(spark.sql(q))
      assert(shuffles(plan).isEmpty,
        s"group-by on the partition key should reuse the storage clustering:\n$plan")
      val got = spark.sql(q)
      val expected = src.groupBy("g").agg(sum(col("v") * col("w")).as("s"))
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    }
  }

  // ---------------------------------------------- manifest-only aggregates

  private def isLocalOnly(p: SparkPlan): Boolean =
    collectAll(p) { case b: BatchScanExec => b }.isEmpty &&
      collectAll(p) {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      }.nonEmpty

  test("count(*)/count(col)/min/max answer from the manifest with zero file reads") {
    ensureCatalog()
    val src = spark.range(0, 5000).select(
      col("id"),
      when(col("id") % 7 =!= 0, col("id") % 100).as("v"), // nulls every 7th
      (col("id") % 13).cast("int").as("small"))
    spark.sql("DROP TABLE IF EXISTS snap.agg.t")
    src.createOrReplaceTempView("magg_src")
    spark.sql("CREATE TABLE snap.agg.t AS SELECT * FROM magg_src")

    val q = "SELECT count(*) AS cnt, count(v) AS cntv, min(id) AS mn, max(id) AS mx, " +
      "min(small) AS smn, max(small) AS smx FROM snap.agg.t"
    val plan = executed(spark.sql(q))
    assert(isLocalOnly(plan), s"expected a manifest-local aggregate plan:\n$plan")
    val row = spark.sql(q).collect().head
    assert(row.getLong(0) == 5000)
    assert(row.getLong(1) == src.where(col("v").isNotNull).count())
    assert(row.getLong(2) == 0 && row.getLong(3) == 4999)
    assert(row.getInt(4) == 0 && row.getInt(5) == 12)
  }

  test("manifest aggregate grouped by the partition column: one local row per value") {
    ensureCatalog()
    val src = spark.range(0, 3000).select((col("id") % 6).as("p"), col("id").as("v"))
    spark.sql("DROP TABLE IF EXISTS snap.agg.byp")
    src.createOrReplaceTempView("magg_byp_src")
    spark.sql("CREATE TABLE snap.agg.byp PARTITIONED BY (p) AS SELECT * FROM magg_byp_src")
    val q = "SELECT p, count(*) AS c, max(v) AS mx FROM snap.agg.byp GROUP BY p"
    val plan = executed(spark.sql(q))
    assert(isLocalOnly(plan), s"expected a manifest-local grouped aggregate:\n$plan")
    val got = spark.sql(q)
    val expected = src.groupBy("p").agg(count(lit(1)).as("c"), max("v").as("mx"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("manifest aggregates REFUSE what they cannot prove: filters, huge longs, doubles, DVs") {
    ensureCatalog()
    // (a) a WHERE clause → rows must stream (scan present), result exact
    val src = spark.range(0, 1000).select(col("id"), (col("id") % 9).as("g"))
    spark.sql("DROP TABLE IF EXISTS snap.agg.ref1")
    src.createOrReplaceTempView("magg_ref1")
    spark.sql("CREATE TABLE snap.agg.ref1 AS SELECT * FROM magg_ref1")
    val fq = "SELECT count(*) AS c FROM snap.agg.ref1 WHERE g = 3"
    val fplan = executed(spark.sql(fq))
    assert(!isLocalOnly(fplan), "a filtered aggregate must not answer from totals")
    assert(spark.sql(fq).collect().head.getLong(0) == src.where(col("g") === 3).count())

    // (b) longs at/above 2^53 ride the manifest as doubles → min/max refused
    val big = spark.range(0, 10).select((col("id") + (1L << 53)).as("h"))
    spark.sql("DROP TABLE IF EXISTS snap.agg.ref2")
    big.createOrReplaceTempView("magg_ref2")
    spark.sql("CREATE TABLE snap.agg.ref2 AS SELECT * FROM magg_ref2")
    val bq = "SELECT min(h) AS mn, max(h) AS mx FROM snap.agg.ref2"
    assert(!isLocalOnly(executed(spark.sql(bq))),
      "2^53-range long bounds are double-rounded and must not be trusted")
    val brow = spark.sql(bq).collect().head
    assert(brow.getLong(0) == (1L << 53) && brow.getLong(1) == (1L << 53) + 9)

    // (c) float/double min/max: bounds may exclude NaN → refused
    val dbl = spark.range(0, 100).select(col("id").cast("double").as("d"))
    spark.sql("DROP TABLE IF EXISTS snap.agg.ref3")
    dbl.createOrReplaceTempView("magg_ref3")
    spark.sql("CREATE TABLE snap.agg.ref3 AS SELECT * FROM magg_ref3")
    assert(!isLocalOnly(executed(spark.sql("SELECT max(d) AS mx FROM snap.agg.ref3"))))

    // (d) deletion vectors: count(*) stays manifest-local (live rows are
    // exact metadata), min/max falls back to scanning
    val dvDir = s"$root/agg/dvt"
    SnapshotTable.write(spark,
      spark.range(0, 2000).select(col("id"), (col("id") % 4).as("q")), dvDir)
    SnapshotTable.deleteMoR(spark, dvDir, col("q") === 1L)
    val cq = s"SELECT count(*) AS c FROM snap.`$dvDir`"
    val cplan = executed(spark.sql(cq))
    assert(isLocalOnly(cplan), s"live-row count(*) is exact under DVs:\n$cplan")
    assert(spark.sql(cq).collect().head.getLong(0) == 1500)
    val mq = s"SELECT min(id) AS mn FROM snap.`$dvDir`"
    assert(!isLocalOnly(executed(spark.sql(mq))),
      "a DV may have deleted the bound row; min must re-scan")
    assert(spark.sql(mq).collect().head.getLong(0) == 0)
  }

  // ---------------------------------------------- runtime (DPP) pruning

  test("a selective dimension filter runtime-prunes the partitioned fact's files") {
    ensureCatalog()
    val fact = spark.range(0, 20000)
      .select((col("id") % 20).as("pk"), col("id").as("m"))
    val dim = spark.range(0, 20)
      .select(col("id").as("dk"), concat(lit("n"), col("id")).as("name"))
    spark.sql("DROP TABLE IF EXISTS snap.dpp.fact")
    fact.createOrReplaceTempView("dpp_fact_src")
    spark.sql("CREATE TABLE snap.dpp.fact PARTITIONED BY (pk) AS SELECT * FROM dpp_fact_src")
    dim.createOrReplaceTempView("dpp_dim")

    val all = scannedFiles(executed(spark.sql("SELECT * FROM snap.dpp.fact")))
    assert(all.size >= 20, s"expected >=20 routed files, got ${all.size}")

    val q = "SELECT f.pk, sum(f.m) AS s FROM snap.dpp.fact f " +
      "JOIN dpp_dim d ON f.pk = d.dk WHERE d.name IN ('n3', 'n7') GROUP BY f.pk"
    val plan = executed(spark.sql(q))
    val read = scannedFiles(plan)
    assert(read.size < all.size / 2,
      s"runtime pruning should drop most files: read ${read.size} of ${all.size}\n$plan")
    val got = spark.sql(q)
    val expected = fact.join(dim, col("pk") === col("dk"))
      .where(col("name").isin("n3", "n7"))
      .groupBy("pk").agg(sum("m").as("s"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("runtime pruning survives Hive-escaped partition directories (timestamp identity)") {
    ensureCatalog()
    // identity TIMESTAMP partitions render Hive-escaped directory names
    // (space + %3A); the surviving-file set and the scan compare paths in
    // different string forms unless both normalize to the SparkPath form —
    // a mismatch here silently narrowed such scans to ZERO files (r12 fix)
    val fact = spark.range(0, 8000)
      .select(timestamp_seconds((col("id") % 8) * 3600).as("ts"), col("id").as("m"))
    val dim = spark.range(0, 8)
      .select(timestamp_seconds(col("id") * 3600).as("dts"),
        concat(lit("h"), col("id")).as("name"))
    spark.sql("DROP TABLE IF EXISTS snap.dpp.tsfact")
    fact.createOrReplaceTempView("dpp_tsfact_src")
    spark.sql("CREATE TABLE snap.dpp.tsfact PARTITIONED BY (ts) AS SELECT * FROM dpp_tsfact_src")
    dim.createOrReplaceTempView("dpp_tsdim")

    val all = scannedFiles(executed(spark.sql("SELECT * FROM snap.dpp.tsfact")))
    assert(all.size >= 8, s"expected >=8 routed files, got ${all.size}")
    assert(all.exists(_.contains("%")),
      s"setup must produce URI-escaped directory names, got $all")

    val q = "SELECT f.ts, sum(f.m) AS s FROM snap.dpp.tsfact f " +
      "JOIN dpp_tsdim d ON f.ts = d.dts WHERE d.name IN ('h2', 'h5') GROUP BY f.ts"
    val plan = executed(spark.sql(q))
    val read = scannedFiles(plan)
    assert(read.nonEmpty, "runtime narrowing must never drop every file")
    assert(read.size < all.size / 2,
      s"runtime pruning should drop most escaped-dir files: read ${read.size} of ${all.size}")
    val got = spark.sql(q)
    val expected = fact.join(dim, col("ts") === col("dts"))
      .where(col("name").isin("h2", "h5"))
      .groupBy("ts").agg(sum("m").as("s"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
