package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.catalog.{PartitionFields, SnapshotCatalog, SnapshotTable}

/** PARTITION EVOLUTION (`SnapshotTable.setPartitionSpec` / `CALL
  * snap.system.set_partition_spec`) — the spec changes in place as a
  * METADATA-ONLY commit; correctness never depends on layout:
  *
  *  - old files keep their old routing (read conservatively under the
  *    new spec), new writes route by the new spec, and the next compact
  *    re-routes history — after which the new spec prunes EVERY file;
  *  - the bucket marker encodes n (`__pb_<n>_<col>=`), so evolving
  *    bucket(8,k) → bucket(16,k) can never read an old 8-domain id as a
  *    16-domain id — the aliasing that would prune live rows;
  *  - a `VERSION AS OF` read pinned before the change still reports the
  *    OLD spec (the spec is versioned like the schema).
  */
class PartitionEvolutionSpec extends SparkSpec {

  private lazy val root: String = Files.createTempDirectory("graft-evo").toString

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snap.root", root)
  }

  // executed / collectAll come from SparkSpec — one shared definition

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

  private def mkRows(n: Long): DataFrame =
    spark.range(0, n).select(
      date_add(to_date(lit("2024-01-01")), (col("id") % 120).cast("int")).as("d"),
      (col("id") % 101).as("k"), col("id").as("v"))

  test("identity -> months(d): metadata-only change; mixed layouts read right; compact restores full pruning") {
    ensureCatalog()
    val dir = s"$root/evo1/t"
    SnapshotTable.write(spark, mkRows(2000), dir, partitionCols = Some(Seq("k")))
    val before = SnapshotTable.currentManifest(spark, dir).get

    val v = SnapshotTable.setPartitionSpec(spark, dir, Seq("months(d)"))
    val after = SnapshotTable.currentManifest(spark, dir).get
    assert(after.version == v && after.partitionCols.contains(Seq("months(d)")))
    // METADATA-ONLY: the exact same data files are carried
    assert(after.entries.map(_.path).sorted == before.entries.map(_.path).sorted)

    // appended batches route by the NEW spec
    SnapshotTable.append(spark, mkRows(1000).withColumn("v", col("v") + 100000), dir)
    val mixed = SnapshotTable.currentManifest(spark, dir).get
    val newFiles = mixed.entries.map(_.path).filterNot(before.entries.map(_.path).toSet)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("__pt_months_d=")))
    assert(before.entries.forall(!_.path.contains("__pt_months_d=")))

    // a raw-column range reads ALL old files (conservative) but only the
    // admissible new ones — and loses no row
    val q = s"SELECT count(*) AS c FROM snap.`$dir` " +
      "WHERE d >= DATE'2024-02-01' AND d < DATE'2024-03-01'"
    val expected = mkRows(2000).union(mkRows(1000))
      .filter(col("d") >= lit("2024-02-01") && col("d") < lit("2024-03-01")).count()
    assert(spark.sql(q).collect().head.getLong(0) == expected)
    val files = scannedFiles(executed(spark.sql(q.replace("count(*) AS c", "*"))))
    files.filter(_.contains("__pt_months_d=")).foreach { f =>
      val ord = "__pt_months_d=(-?\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toInt)
      assert(ord.forall(o => o == 649), s"2024-02 is month ordinal 649; read $f") // (2024-1970)*12+1
    }

    // compact re-routes EVERYTHING into the new layout
    SnapshotTable.compact(spark, dir)
    val compacted = SnapshotTable.currentManifest(spark, dir).get
    assert(compacted.entries.forall(_.path.contains("__pt_months_d=")))
    val pruned = scannedFiles(executed(spark.sql(q.replace("count(*) AS c", "*"))))
    pruned.foreach(f => assert(f.contains("__pt_months_d=649/"),
      s"after compact only 2024-02's files may be read: $f"))
    assert(spark.sql(q).collect().head.getLong(0) == expected)
  }

  test("bucket(8,k) -> bucket(16,k): old 8-domain ids are never read as 16-domain ids") {
    ensureCatalog()
    val dir = s"$root/evo2/t"
    SnapshotTable.write(spark, mkRows(2000), dir, partitionCols = Some(Seq("bucket(8,k)")))
    SnapshotTable.setPartitionSpec(spark, dir, Seq("bucket(16,k)"))
    SnapshotTable.append(spark, mkRows(800).withColumn("v", col("v") + 500000), dir)

    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.exists(_.path.contains("__pb_8_k=")) &&
      m.entries.exists(_.path.contains("__pb_16_k=")))

    // every key returns its rows from BOTH generations — an id-domain
    // aliasing bug would silently drop the old generation's rows for keys
    // whose 8- and 16-bucket ids differ
    val expected = mkRows(2000).union(mkRows(800))
      .filter(col("k") === 42).count()
    val plan = executed(spark.sql(s"SELECT * FROM snap.`$dir` WHERE k = 42"))
    assert(spark.sql(s"SELECT count(*) AS c FROM snap.`$dir` WHERE k = 42")
      .collect().head.getLong(0) == expected)
    // new-generation files confine to the 16-domain id; old-generation
    // files are kept conservatively (their marker names a different spec)
    val id16 = PartitionFields.bucketId(42L, org.apache.spark.sql.types.LongType, 16)
    scannedFiles(plan).filter(_.contains("__pb_16_k=")).foreach(f =>
      assert(f.contains(s"__pb_16_k=$id16/"), s"16-domain file outside id $id16 read: $f"))
  }

  test("CALL set_partition_spec: SQL surface, un-partitioning, refusals, history op") {
    ensureCatalog()
    spark.sql("DROP TABLE IF EXISTS snap.evo.p")
    mkRows(500).createOrReplaceTempView("evo_src")
    spark.sql("CREATE TABLE snap.evo.p AS SELECT * FROM evo_src")

    val out = spark.sql(
      "CALL snap.system.set_partition_spec(table => 'evo.p', spec => 'days(d), bucket(4,k)')")
      .collect().head
    assert(out.getString(1) == "days(d),bucket(4,k)")
    assert(SnapshotTable.partitionColumns(spark, s"$root/evo/p") ==
      Seq("days(d)", "bucket(4,k)"))

    // un-partition with ''
    spark.sql("CALL snap.system.set_partition_spec(table => 'evo.p', spec => '')")
    assert(SnapshotTable.partitionColumns(spark, s"$root/evo/p").isEmpty)

    // refusals: unknown column, type-invalid transform
    val e1 = intercept[Exception] {
      spark.sql("CALL snap.system.set_partition_spec(table => 'evo.p', spec => 'days(nope)')")
    }
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[Exception] {
      spark.sql("CALL snap.system.set_partition_spec(table => 'evo.p', spec => 'days(v)')")
    }
    assert(e2.getMessage.contains("days"))

    val ops = spark.sql("SELECT op FROM snap.evo.`p`.history").collect().map(_.getString(0))
    assert(ops.count(_ == "set-partition-spec") == 2, ops.mkString(","))
  }

  test("a VERSION AS OF read pinned before the change reports the OLD spec") {
    ensureCatalog()
    val dir = s"$root/evo3/t"
    SnapshotTable.write(spark, mkRows(300), dir, partitionCols = Some(Seq("k")))
    val v1 = SnapshotTable.currentManifest(spark, dir).get.version
    SnapshotTable.setPartitionSpec(spark, dir, Seq("months(d)"))

    // the spec is versioned like the schema: the pinned manifest still
    // carries the old one (DESCRIBE has no VERSION AS OF syntax in Spark,
    // so assert on the manifest the pinned read resolves)
    assert(SnapshotTable.manifestFor(spark, dir, Some(v1))
      .partitionCols.contains(Seq("k")))
    assert(SnapshotTable.manifestFor(spark, dir, None)
      .partitionCols.contains(Seq("months(d)")))
    // and the pinned READ still answers from the old snapshot
    assert(spark.sql(s"SELECT count(*) AS c FROM snap.`$dir` VERSION AS OF $v1")
      .collect().head.getLong(0) == 300)
  }

  test("spec evolution under a LIVE stream: next epoch routes by the NEW spec, mixed domains read right") {
    ensureCatalog()
    // the streaming write re-binds its routing expressions per epoch, so
    // evolving the spec under a RUNNING query takes effect at the very
    // next micro-batch — no stale-spec epochs, no restart needed. The
    // mixed-domain manifest (old epochs __pb_8_, new epochs __pb_16_)
    // then reads conservatively until compaction unifies it
    val dir = s"$root/live/t"
    SnapshotTable.write(spark,
      spark.range(0, 0).select(col("id").as("k"), col("id").as("v")), dir,
      partitionCols = Some(Seq("bucket(8,k)")))
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val q = mem.toDF().select(col("value").as("k"), (col("value") * 2).as("v"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-evo-live").toString)
      .toTable(s"snap.`$dir`")
    mem.addData(0L until 200L: _*)
    q.processAllAvailable() // epoch routed under bucket(8,k)

    SnapshotTable.setPartitionSpec(spark, dir, Seq("bucket(16,k)"))
    mem.addData(200L until 400L: _*)
    q.processAllAvailable() // routing re-binds: this epoch routes __pb_16_k=
    q.stop()

    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.partitionCols.contains(Seq("bucket(16,k)")),
      "the epoch append must not clobber the evolved spec")
    assert(m.entries.exists(_.path.contains("__pb_8_k=")),
      "the pre-evolution epoch keeps its old-domain markers")
    assert(m.entries.exists(_.path.contains("__pb_16_k=")),
      "the post-evolution epoch must route in the NEW domain without a restart")
    assert(m.entries.forall(e =>
      e.path.contains("__pb_8_k=") || e.path.contains("__pb_16_k=")),
      s"every epoch file routes in exactly one domain: ${m.entries.map(_.path)}")

    // reads complete across the mixed domains; a point lookup under the
    // NEW spec keeps every row — old-domain markers must not be read as
    // 16-domain ids
    assert(SnapshotTable.read(spark, dir).count() == 400)
    (Seq(3L, 77L, 399L)).foreach { key =>
      val got = spark.sql(s"SELECT v FROM snap.`$dir` WHERE k = $key")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(key * 2), s"k=$key must survive new-spec pruning, got $got")
    }

    // compact re-routes everything into the new domain; pruning tightens
    SnapshotTable.compact(spark, dir)
    val mc = SnapshotTable.currentManifest(spark, dir).get
    assert(mc.entries.forall(_.path.contains("__pb_16_k=")),
      s"compaction must re-route to the evolved spec: ${mc.entries.map(_.path)}")
    val one = executed(spark.sql(s"SELECT v FROM snap.`$dir` WHERE k = 77"))
    val read = scannedFiles(one)
    assert(read.nonEmpty && read.forall(_.contains("__pb_16_k=")) && read.size <= 2,
      s"post-compact lookup must confine to the new-domain bucket: $read")
    assert(SnapshotTable.read(spark, dir).count() == 400)
  }
}
