package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.{PartitionFields, SnapshotCatalog, SnapshotTable}

/** Temporal (`years/months/days/hours(col)`) and `truncate(w,col)`
  * partition transforms — Iceberg's HIDDEN partitioning: the user
  * filters on the RAW column; because every transform is monotone in the
  * source value, equality, IN, AND RANGE predicates prune by the file's
  * routing directory alone.
  *
  * The transform value has ONE definition ([[PartitionFields]]) shared by
  * the writer's routing column, the pruner's literal evaluation, and the
  * catalog's V2 functions — the first test asserts the Column-vs-literal
  * parity row by row (including pre-1970 values, where floorDiv vs
  * truncating division diverge), so the three can never disagree.
  */
class TemporalPartitionSpec extends SparkSpec {

  private lazy val root: String = Files.createTempDirectory("graft-temporal").toString

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snap.root", root)
  }

  // executed / collectAll / withConf come from SparkSpec — one shared
  // definition across every plan-shape spec

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


  /** Timestamps spanning pre-1970 (negative micros: floorDiv territory),
    * the epoch edge, and a few years of spread; plus nulls.
    */
  private def tsFrame(rows: Long): DataFrame =
    spark.range(0, rows)
      .select(timestamp_micros(
        col("id") * 8640000000L - 50L * 86400000000L + pmod(col("id") * 7919L, lit(86399999999L)))
        .as("ts"), col("id").as("v"))
      .union(spark.range(0, 5).select(lit(null).cast("timestamp").as("ts"), col("id").as("v")))

  test("routing parity: Column route == literal transformValue for every unit, incl. pre-1970") {
    val df = tsFrame(4000).filter(col("ts").isNotNull)
      .withColumn("d", col("ts").cast("date"))
    for (unit <- Seq("years", "months", "days", "hours")) {
      val f = PartitionFields.Temporal(unit, "ts")
      val routed = df.withColumn("route", PartitionFields.routeColumn(f, TimestampType))
        .select("ts", "route").collect()
      routed.foreach { r =>
        val micros = r.getTimestamp(0).toInstant.getEpochSecond * 1000000L +
          r.getTimestamp(0).toInstant.getNano / 1000L
        val expect = PartitionFields.transformValue(micros, TimestampType, f).get
        assert(r.getInt(1) == expect,
          s"$unit(${r.getTimestamp(0)}): route ${r.getInt(1)} != literal $expect")
      }
    }
    for (unit <- Seq("years", "months", "days")) {
      val f = PartitionFields.Temporal(unit, "d")
      val routed = df.withColumn("route", PartitionFields.routeColumn(f, DateType))
        .select("d", "route").collect()
      routed.foreach { r =>
        val days = r.getDate(0).toLocalDate.toEpochDay.toInt
        val expect = PartitionFields.transformValue(days, DateType, f).get
        assert(r.getInt(1) == expect)
      }
    }
  }

  test("days(ts): every file routes under its ordinal; range/equality/IS NULL prune by directory") {
    ensureCatalog()
    val dir = s"$root/days/t"
    SnapshotTable.write(spark, tsFrame(3000), dir, partitionCols = Some(Seq("days(ts)")))

    // row-by-row: the directory ordinal matches the value's transform
    val mismatches = spark.sql(s"SELECT ts, _file FROM snap.`$dir` WHERE ts IS NOT NULL")
      .withColumn("dirOrd",
        regexp_extract(col("_file"), "__pt_days_ts=(-?\\d+)/", 1).cast("int"))
      .withColumn("computed",
        PartitionFields.routeColumn(PartitionFields.Temporal("days", "ts"), TimestampType))
      .filter(col("dirOrd") =!= col("computed"))
    assert(mismatches.count() == 0)

    val all = scannedFiles(executed(spark.sql(s"SELECT * FROM snap.`$dir`")))

    // RANGE on the raw column (hidden partitioning): only ordinals inside
    // [T(lo), T(hi)] may be read
    val lo = "1970-03-01 00:00:00"
    val hi = "1970-04-01 00:00:00"
    val ranged = executed(spark.sql(
      s"SELECT * FROM snap.`$dir` WHERE ts >= TIMESTAMP'$lo' AND ts < TIMESTAMP'$hi'"))
    val rangedFiles = scannedFiles(ranged)
    val loOrd = 59 // 1970-03-01 is epoch day 59
    val hiOrd = 90
    assert(rangedFiles.nonEmpty && rangedFiles.subsetOf(all))
    rangedFiles.foreach { f =>
      val ord = "__pt_days_ts=(-?\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toInt)
      assert(ord.forall(o => o >= loOrd && o <= hiOrd), s"out-of-range file read: $f")
    }
    // and the rows are right (parity vs an unpartitioned scan)
    val expected = tsFrame(3000)
      .filter(col("ts") >= lit(lo).cast("timestamp") && col("ts") < lit(hi).cast("timestamp"))
      .count()
    assert(spark.sql(
      s"SELECT count(*) AS c FROM snap.`$dir` WHERE ts >= TIMESTAMP'$lo' AND ts < TIMESTAMP'$hi'")
      .collect().head.getLong(0) == expected)

    // equality stays within one ordinal's files
    val eqFiles = scannedFiles(executed(spark.sql(
      s"SELECT * FROM snap.`$dir` WHERE ts = TIMESTAMP'1970-03-02 12:00:00'")))
    eqFiles.foreach(f => assert(f.contains("__pt_days_ts=60/") || !f.contains("__pt_days_ts="),
      s"equality must stay inside day 60: $f"))

    // IS NULL reads no ROUTED file (nulls all sit in the default partition)
    val nullFiles = scannedFiles(executed(
      spark.sql(s"SELECT * FROM snap.`$dir` WHERE ts IS NULL")))
    assert(nullFiles.forall(f => !f.contains("__pt_days_ts=") ||
      f.contains("__pt_days_ts=__HIVE_DEFAULT_PARTITION__")))
    assert(spark.sql(s"SELECT count(*) AS c FROM snap.`$dir` WHERE ts IS NULL")
      .collect().head.getLong(0) == 5)

    // pre-1970 ordinals are negative and still prune
    val negFiles = scannedFiles(executed(spark.sql(
      s"SELECT * FROM snap.`$dir` WHERE ts < TIMESTAMP'1970-01-01 00:00:00'")))
    assert(negFiles.nonEmpty)
    negFiles.foreach { f =>
      val ord = "__pt_days_ts=(-?\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toInt)
      assert(ord.forall(_ <= -1), s"a positive-day file survived ts < epoch: $f")
    }
  }

  test("SQL DDL: PARTITIONED BY (days(ts)) creates the layout; DESCRIBE shows it") {
    ensureCatalog()
    spark.sql("DROP TABLE IF EXISTS snap.tp.ddl")
    tsFrame(500).createOrReplaceTempView("tp_ddl_src")
    spark.sql("CREATE TABLE snap.tp.ddl PARTITIONED BY (days(ts)) AS SELECT * FROM tp_ddl_src")
    val m = SnapshotTable.currentManifest(spark, s"$root/tp/ddl").get
    assert(m.partitionCols.contains(Seq("days(ts)")))
    assert(m.entries.exists(_.path.contains("__pt_days_ts=")))
    val desc = spark.sql("DESCRIBE EXTENDED snap.tp.ddl").collect().map(_.mkString(" "))
    assert(desc.exists(_.contains("days(ts)")), desc.mkString("\n"))
  }

  test("months(date) and years(date): date-typed sources route and range-prune") {
    ensureCatalog()
    val dir = s"$root/months/t"
    val df = spark.range(0, 2000)
      .select(date_add(to_date(lit("1969-06-15")), (col("id") % 900).cast("int")).as("d"),
        col("id").as("v"))
    SnapshotTable.write(spark, df, dir, partitionCols = Some(Seq("months(d)")))

    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.forall(_.path.contains("__pt_months_d=")))

    // 1970-02 is month ordinal 1; 1969-12 is -1
    val files = scannedFiles(executed(spark.sql(
      s"SELECT * FROM snap.`$dir` WHERE d >= DATE'1970-02-01' AND d < DATE'1970-03-01'")))
    assert(files.nonEmpty)
    files.foreach(f => assert(f.contains("__pt_months_d=1/"), s"non-Feb-1970 file read: $f"))
    val cnt = spark.sql(
      s"SELECT count(*) AS c FROM snap.`$dir` WHERE d >= DATE'1970-02-01' AND d < DATE'1970-03-01'")
      .collect().head.getLong(0)
    assert(cnt == df.filter(col("d") >= lit("1970-02-01") && col("d") < lit("1970-03-01")).count())

    val preFiles = scannedFiles(executed(spark.sql(
      s"SELECT * FROM snap.`$dir` WHERE d < DATE'1970-01-01'")))
    preFiles.foreach { f =>
      val ord = "__pt_months_d=(-?\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toInt)
      assert(ord.forall(_ <= -1), s"a 1970+ month file survived d < 1970: $f")
    }
  }

  test("co-partitioned days(ts) tables join shuffle-free through the catalog's V2 days function") {
    ensureCatalog()
    val mk = (n: Long, m: Int) => spark.range(0, n)
      .select(timestamp_micros((col("id") % 40) * 86400000000L).as("ts"),
        (col("id") * m).as("v"))
    SnapshotTable.write(spark, mk(2000, 1), s"$root/spj/a", partitionCols = Some(Seq("days(ts)")))
    SnapshotTable.write(spark, mk(600, 7), s"$root/spj/b", partitionCols = Some(Seq("days(ts)")))
    val q = s"SELECT x.ts, x.v, y.v AS w FROM snap.`$root/spj/a` x " +
      s"JOIN snap.`$root/spj/b` y ON x.ts = y.ts"
    val expected = mk(2000, 1).join(mk(600, 7).withColumnRenamed("v", "w"), "ts")
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = executed(spark.sql(q))
      val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected a shuffle-free days-partitioned join:\n$plan")
      val got = spark.sql(q)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    }
  }

  test("truncate(w, long): floor-to-multiple routing (negatives floor DOWN); range pruning") {
    ensureCatalog()
    val dir = s"$root/truncl/t"
    val df = spark.range(0, 4000).select((col("id") * 13 - 20000).as("k"), col("id").as("v"))
    SnapshotTable.write(spark, df, dir, partitionCols = Some(Seq("truncate(1000,k)")))

    // routing parity incl. negative keys: -1 floors to -1000, not 0
    val mismatches = spark.sql(s"SELECT k, _file FROM snap.`$dir`")
      .withColumn("dirV", regexp_extract(col("_file"), "__pr_1000_k=(-?\\d+)/", 1).cast("long"))
      .withColumn("computed", col("k") - pmod(col("k"), lit(1000L)))
      .filter(col("dirV") =!= col("computed"))
    assert(mismatches.count() == 0)

    val files = scannedFiles(executed(spark.sql(
      s"SELECT * FROM snap.`$dir` WHERE k >= 1500 AND k < 3500")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val v = "__pr_1000_k=(-?\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toLong)
      assert(v.forall(x => x >= 1000 && x <= 3000), s"out-of-range truncate file read: $f")
    }
    val got = spark.sql(s"SELECT count(*) AS c FROM snap.`$dir` WHERE k >= 1500 AND k < 3500")
      .collect().head.getLong(0)
    assert(got == df.filter(col("k") >= 1500 && col("k") < 3500).count())

    val negFiles = scannedFiles(executed(spark.sql(
      s"SELECT * FROM snap.`$dir` WHERE k < -18000")))
    negFiles.foreach { f =>
      val v = "__pr_1000_k=(-?\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toLong)
      assert(v.forall(_ <= -18000), s"file above the range read: $f")
    }
  }

  test("truncate(w, string): code-point prefix routing; escaped directory values never prune") {
    ensureCatalog()
    val dir = s"$root/truncs/t"
    val df = spark.range(0, 2000)
      .select(concat(lit("k"), lpad((col("id") % 97).cast("string"), 2, "0"),
        lit("_tail")).as("s"), col("id").as("v"))
      // a value whose prefix needs Hive escaping in the path (':' escapes)
      .union(spark.range(0, 7).select(concat(lit("x:"), col("id")).as("s"), col("id").as("v")))
    SnapshotTable.write(spark, df, dir, partitionCols = Some(Seq("truncate(3,s)")))

    // prefix truncation is UTF8String.substringSQL on both sides
    assert(PartitionFields.transformValue(
      UTF8String.fromString("héllo"), StringType, PartitionFields.Truncate(3, "s"))
      .contains(UTF8String.fromString("hél")))

    val files = scannedFiles(executed(spark.sql(
      s"SELECT * FROM snap.`$dir` WHERE s >= 'k50' AND s < 'k60'")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val seg = "__pr_3_s=([^/]+)/".r.findFirstMatchIn(f).map(_.group(1))
      // escaped segments ('%xx') are conservatively kept; literal ones
      // must sit inside the prefix range
      seg.filterNot(_.contains("%")).foreach(p =>
        assert(p >= "k50" && p <= "k60", s"out-of-range prefix file read: $f ($p)"))
    }
    val got = spark.sql(s"SELECT count(*) AS c FROM snap.`$dir` WHERE s >= 'k50' AND s < 'k60'")
      .collect().head.getLong(0)
    assert(got == df.filter(col("s") >= "k50" && col("s") < "k60").count())

    // escaped values still READ correctly (pruning was conservative)
    assert(spark.sql(s"SELECT count(*) AS c FROM snap.`$dir` WHERE s = 'x:3'")
      .collect().head.getLong(0) == 1)
  }

  test("refusals: hours(date), temporal on ntz/long, truncate(date) fail loudly at write") {
    val dateDf = spark.range(0, 10)
      .select(to_date(lit("2024-01-01")).as("d"), col("id").as("v"))
    val e1 = intercept[IllegalArgumentException] {
      SnapshotTable.write(spark, dateDf, s"$root/bad1", partitionCols = Some(Seq("hours(d)")))
    }
    assert(e1.getMessage.contains("hours"))
    val longDf = spark.range(0, 10).select(col("id").as("k"), col("id").as("v"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.write(spark, longDf, s"$root/bad2", partitionCols = Some(Seq("days(k)")))
    }
    assert(e2.getMessage.contains("days"))
    val ntzDf = spark.range(0, 10)
      .select(lit("2024-01-01 00:00:00").cast("timestamp_ntz").as("t"), col("id").as("v"))
    val e3 = intercept[IllegalArgumentException] {
      SnapshotTable.write(spark, ntzDf, s"$root/bad3", partitionCols = Some(Seq("days(t)")))
    }
    assert(e3.getMessage.contains("timestamp_ntz"))
    val e4 = intercept[IllegalArgumentException] {
      SnapshotTable.write(spark, dateDf, s"$root/bad4", partitionCols = Some(Seq("truncate(3,d)")))
    }
    assert(e4.getMessage.contains("truncate"))
  }
}
