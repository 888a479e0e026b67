package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.catalog.{PartitionFields, SnapshotCatalog, SnapshotTable}

/** Bucket-transform partitioning (`PARTITIONED BY (bucket(n, col))`) —
  * the co-located-join layout for HIGH-CARDINALITY keys where identity
  * partitioning would explode into one directory per key:
  *
  *  - routing: every data file lands under `__pb_<n>_<col>=<id>` with id =
  *    pmod(xxhash64(col), n), verified row-by-row against the file's
  *    directory;
  *  - storage-partitioned joins: two tables bucketed the same way join
  *    with ZERO shuffles on the bucket column (SQL DDL and Scala writes
  *    produce the same layout);
  *  - point-lookup pruning: `col = v` / `col IN (…)` reads ONLY matching
  *    buckets' files — guaranteed 1/n, independent of value ranges;
  *  - degradation: a row-level rewrite (un-routed file) disables the join
  *    layout but never correctness; compaction re-routes and restores it.
  */
class BucketPartitionSpec extends SparkSpec {

  private lazy val root: String = Files.createTempDirectory("graft-bucket").toString

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snap.root", root)
  }

  // executed / collectAll / withConf come from SparkSpec — one shared
  // definition across every plan-shape spec

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    collectAll(p) { case s: ShuffleExchangeExec => s }

  private def scannedFiles(p: SparkPlan): Set[String] =
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

  test("routing: every file's __pb_ directory id matches pmod(xxhash64(col), n) of its rows") {
    ensureCatalog()
    val dir = s"$root/route/t"
    val src = spark.range(0, 3000)
      .select(concat(lit("k"), col("id") % 257).as("k"), col("id").as("v"))
      // null keys must route like any other value
      .union(spark.range(0, 10).select(lit(null: String).as("k"), col("id").as("v")))
    SnapshotTable.write(spark, src, dir, partitionCols = Some(Seq("bucket(8,k)")))

    val mismatches = spark.sql(
      s"SELECT k, _file FROM snap.`$dir`")
      .withColumn("dirId",
        regexp_extract(col("_file"), "__pb_8_k=(\\d+)/", 1).cast("int"))
      .withColumn("computed", pmod(xxhash64(col("k")), lit(8L)).cast("int"))
      .filter(col("dirId") =!= col("computed"))
    assert(mismatches.count() == 0)

    // the catalog surfaces the transform
    val desc = spark.sql(s"DESCRIBE EXTENDED snap.`$dir`").collect().map(_.mkString(" "))
    assert(desc.exists(_.contains("bucket(8, k)")),
      s"DESCRIBE should show the bucket transform:\n${desc.mkString("\n")}")
  }

  test("co-bucketed tables join with zero shuffles; SQL DDL and Scala writes agree") {
    ensureCatalog()
    val left = spark.range(0, 4000)
      .select((col("id") % 997).as("ck"), col("id").as("lv"))
    val right = spark.range(0, 1000)
      .select((col("id") % 997).as("ck"), (col("id") * 7).as("rv"))
    // left through SQL DDL, right through the Scala writer — the layouts
    // must be interchangeable
    left.createOrReplaceTempView("bj_left_src")
    spark.sql("DROP TABLE IF EXISTS snap.bj.l")
    spark.sql("CREATE TABLE snap.bj.l PARTITIONED BY (bucket(16, ck)) " +
      "AS SELECT * FROM bj_left_src")
    SnapshotTable.write(spark, right, s"$root/bj/r",
      partitionCols = Some(Seq("bucket(16,ck)")))

    val q = s"SELECT l.ck, l.lv, r.rv FROM snap.bj.l l " +
      s"JOIN snap.`$root/bj/r` r ON l.ck = r.ck"
    val expected = left.join(right, "ck").select(col("ck"), col("lv"), col("rv"))

    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = executed(spark.sql(q))
      assert(shuffles(plan).isEmpty,
        s"expected a shuffle-free bucket-partitioned join, got:\n$plan")
      val got = spark.sql(q)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    }
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(shuffles(executed(spark.sql(q))).nonEmpty)
    }
  }

  test("point lookups read only the matching bucket's files; IN-lists union buckets") {
    ensureCatalog()
    val dir = s"$root/point/t"
    val src = spark.range(0, 20000)
      .select(col("id").as("ck"), (col("id") * 3).as("v"))
    SnapshotTable.write(spark, src, dir, partitionCols = Some(Seq("bucket(16,ck)")))

    val all = scannedFiles(executed(spark.sql(s"SELECT * FROM snap.`$dir`")))
    assert(all.size >= 16, s"expected >= 16 routed files, got ${all.size}")

    val one = executed(spark.sql(s"SELECT * FROM snap.`$dir` WHERE ck = 12345"))
    val oneFiles = scannedFiles(one)
    val expectedBucket = PartitionFields.bucketId(12345L,
      org.apache.spark.sql.types.LongType, 16)
    assert(oneFiles.nonEmpty && oneFiles.forall(_.contains(s"__pb_16_ck=$expectedBucket/")),
      s"a point lookup must stay inside bucket $expectedBucket: $oneFiles")
    assert(spark.sql(s"SELECT v FROM snap.`$dir` WHERE ck = 12345")
      .collect().map(_.getLong(0)).toSeq == Seq(12345L * 3))

    val inFiles = scannedFiles(executed(
      spark.sql(s"SELECT * FROM snap.`$dir` WHERE ck IN (1, 2, 3)")))
    val admissible = Seq(1L, 2L, 3L)
      .map(v => PartitionFields.bucketId(v, org.apache.spark.sql.types.LongType, 16)).toSet
    assert(inFiles.nonEmpty &&
      inFiles.forall(f => admissible.exists(b => f.contains(s"__pb_16_ck=$b/"))),
      s"an IN-list must stay inside buckets $admissible: $inFiles")
    assert(spark.sql(s"SELECT count(*) AS c FROM snap.`$dir` WHERE ck IN (1, 2, 3)")
      .collect().head.getLong(0) == 3)
  }

  test("mixed identity + bucket spec: zero-shuffle join on both key parts") {
    ensureCatalog()
    val a = spark.range(0, 3000)
      .select((col("id") % 4).as("g"), (col("id") % 311).as("ck"), col("id").as("va"))
    val b = spark.range(0, 900)
      .select((col("id") % 4).as("g"), (col("id") % 311).as("ck"), (col("id") * 2).as("vb"))
    SnapshotTable.write(spark, a, s"$root/mix/a",
      partitionCols = Some(Seq("g", "bucket(8,ck)")))
    SnapshotTable.write(spark, b, s"$root/mix/b",
      partitionCols = Some(Seq("g", "bucket(8,ck)")))
    val q = s"SELECT x.g, x.ck, x.va, y.vb FROM snap.`$root/mix/a` x " +
      s"JOIN snap.`$root/mix/b` y ON x.g = y.g AND x.ck = y.ck"
    val expected = a.join(b, Seq("g", "ck")).select(col("g"), col("ck"), col("va"), col("vb"))
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = executed(spark.sql(q))
      assert(shuffles(plan).isEmpty, s"expected shuffle-free mixed-spec join:\n$plan")
      val got = spark.sql(q)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    }
  }

  test("an UN-partitioned side shuffles INTO the bucket domain via the catalog's V2 function") {
    ensureCatalog()
    val big = spark.range(0, 6000).select((col("id") % 499).as("ck"), col("id").as("v"))
    val small = spark.range(0, 499).select(col("id").as("ck"), (col("id") * 11).as("w"))
    SnapshotTable.write(spark, big, s"$root/oneside/t",
      partitionCols = Some(Seq("bucket(16,ck)")))
    small.createOrReplaceTempView("oneside_plain")
    val q = s"SELECT t.ck, t.v, p.w FROM snap.`$root/oneside/t` t " +
      "JOIN oneside_plain p ON t.ck = p.ck"
    val expected = big.join(small, "ck").select(col("ck"), col("v"), col("w"))
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = executed(spark.sql(q))
      // exactly ONE shuffle — the plain side hashed into our bucket ids by
      // evaluating SnapshotFunctions.BucketBound; the snapshot side reads
      // in place. A bucket-id disagreement between produceResult and the
      // writer's routing would corrupt the join — row parity proves them
      // bit-identical end-to-end
      assert(shuffles(plan).size == 1,
        s"expected exactly the plain side's shuffle into the bucket domain:\n$plan")
      val got = spark.sql(q)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    }
  }

  test("write alignment: a partitioned commit writes O(values) files, not O(tasks x values)") {
    val dir = s"$root/align/t"
    // 4 shuffle partitions x 8 buckets would be up to 32 files unaligned
    val src = spark.range(0, 8000).repartition(4)
      .select((col("id") % 331).as("ck"), col("id").as("v"))
    SnapshotTable.write(spark, src, dir, partitionCols = Some(Seq("bucket(8,ck)")))
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.size == 8,
      s"rebalance-aligned routing should yield one right-sized file per bucket, " +
        s"got ${m.entries.size}")
  }

  test("a row-level rewrite degrades the join layout (never correctness); compaction restores it") {
    ensureCatalog()
    val mk = (rows: Long) => spark.range(0, rows)
      .select((col("id") % 101).as("ck"), col("id").as("v"))
    SnapshotTable.write(spark, mk(2000), s"$root/deg/a",
      partitionCols = Some(Seq("bucket(8,ck)")))
    SnapshotTable.write(spark, mk(500), s"$root/deg/b",
      partitionCols = Some(Seq("bucket(8,ck)")))

    // the SQL UPDATE's rewritten file is hash-clustered, not routed
    spark.sql(s"UPDATE snap.`$root/deg/a` SET v = v + 1000000 WHERE ck = 7")

    val q = s"SELECT x.ck, x.v, y.v AS w FROM snap.`$root/deg/a` x " +
      s"JOIN snap.`$root/deg/b` y ON x.ck = y.ck"
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val degraded = executed(spark.sql(q))
      assert(shuffles(degraded).nonEmpty,
        "an un-routed rewrite must disable the keyed layout")
      val updatedCount = spark.sql(
        s"SELECT count(*) AS c FROM snap.`$root/deg/a` WHERE v >= 1000000").collect()
        .head.getLong(0)
      assert(updatedCount == mk(2000).filter(col("ck") === 7).count())

      SnapshotTable.compact(spark, s"$root/deg/a")
      val restored = executed(spark.sql(q))
      assert(shuffles(restored).isEmpty,
        s"compaction re-routes, so the join must be shuffle-free again:\n$restored")
    }
  }

  test("un-folded literal-vs-literal predicates fall to the conservative default, never recurse") {
    ensureCatalog()
    val dir = s"$root/litlit/t"
    SnapshotTable.write(spark,
      spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v")),
      dir, partitionCols = Some(Seq("bucket(4,k)")))
    val m = SnapshotTable.currentManifest(spark, dir).get
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    // the optimizer normally constant-folds these away; handed to the
    // transform pruner raw, each flipped form must terminate (no
    // ping-pong between literal-first rewrites) and keep every file
    val shapes: Seq[Expression] = Seq(
      GreaterThan(Literal(1L, LongType), Literal(2L, LongType)),
      GreaterThanOrEqual(Literal(1L, LongType), Literal(2L, LongType)),
      LessThan(Literal(3L, LongType), Literal(2L, LongType)),
      LessThanOrEqual(Literal(3L, LongType), Literal(2L, LongType)),
      EqualTo(Literal(1L, LongType), Literal(2L, LongType)),
      EqualNullSafe(Literal(1L, LongType), Literal(2L, LongType)))
    shapes.foreach { p =>
      assert(SnapshotTable.pruneForFilters(m, Seq(p)).size == m.entries.size,
        s"$p must be kept conservatively (no pruning, no crash)")
    }
    // sanity: a real key predicate still prunes through the same walk
    val real = EqualTo(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("k"), Literal(7L, LongType))
    assert(SnapshotTable.pruneForFilters(m, Seq(real)).size < m.entries.size)
  }
}
