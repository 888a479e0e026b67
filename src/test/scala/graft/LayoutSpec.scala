package graft

import org.apache.spark.sql.functions._
import graft.extensions.GraftExtensions
import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 matches the HOF bit-interleave reference on fuzzed keys") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(31L)
    val keys = (0 until 300).map(_ =>
      (math.abs(rnd.nextLong()) % (1L << 31), math.abs(rnd.nextLong()) % (1L << 31))) :+
      (0L, 0L) :+ ((1L << 31) - 1, (1L << 31) - 1)
    val df = keys.toDF("x", "y")
    // reference: the per-bit interleave computed in plain Scala
    val diff = df.select(col("x"), col("y"),
      Layout.zValue(spark, col("x"), col("y")).as("nat"))
      .collect()
      .filter { r =>
        val x = r.getLong(0); val y = r.getLong(1)
        val expect = (0 until 31).map(i =>
          (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
        r.getLong(2) != expect
      }
    assert(diff.isEmpty, diff.take(3).mkString("; "))
  }

  test("zorder2 is injective on the masked domain (distinct pairs <-> distinct z)") {
    GraftExtensions.register(spark)
    val li = Tables.lineitem(spark, sfDir)
    val pairs = li.select(col("l_partkey"), col("l_suppkey")).distinct().count()
    val zs = li.select(Layout.zValue(spark, col("l_partkey"), col("l_suppkey"))).distinct().count()
    assert(pairs == zs)
  }

  /** Rows the file scan actually emitted (post row-group pruning, pre any
    * Filter operator) — the quantity z-ordering exists to shrink.
    */
  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numOutputRows").value
    }.sum
  }

  test("clusterByZ parquet skips row groups on a point filter of EITHER column — measured") {
    // Z-order pruning needs COMPARABLE bit widths: with 16 z-range
    // partitions only the top ~4 interleaved bits decide the split, and a
    // dimension whose domain is tiny contributes no high bits — measured
    // here: clustering (l_partkey ~200 values, l_suppkey ~10) skipped only
    // 19% on the suppkey side. So cluster on two ~8-bit keys: l_partkey and
    // an 8-bit bucket of l_orderkey (bucketing a wide key down to match the
    // narrow one is the standard fix at any scale).
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        pmod(col("l_orderkey"), lit(256)).as("okey_bucket"))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // same data, two layouts, same file count: clustered by z vs random
    Layout.clusterByZ(li, "l_partkey", "okey_bucket", numPartitions = 16)
      .write.parquet(s"$base/z")
    li.repartition(16).write.parquet(s"$base/flat")

    val probe = li.select("l_partkey", "okey_bucket").head()
    for ((colName, v) <- Seq("l_partkey" -> probe.getLong(0), "okey_bucket" -> probe.getLong(1))) {
      val zRows = scanOutputRows(spark.read.parquet(s"$base/z").filter(col(colName) === v))
      val flatRows = scanOutputRows(spark.read.parquet(s"$base/flat").filter(col(colName) === v))
      // random layout: every file's min/max spans the domain, nothing skips;
      // z layout: only the row groups whose rectangle contains v survive
      assert(zRows < flatRows * 0.6,
        s"$colName: z layout read $zRows rows vs $flatRows random — no row-group skipping " +
          s"(skip ratio ${1.0 - zRows.toDouble / flatRows})")
    }
  }

  test("zorder (variadic) matches the per-bit reference on fuzzed keys at n = 3 and 4") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(47L)
    for (n <- Seq(3, 4)) {
      val width = 63 / n
      val mask = (1L << width) - 1
      val rows = (0 until 200).map(_ => (0 until n).map(_ => math.abs(rnd.nextLong())).toSeq) :+
        Seq.fill(n)(0L) :+ Seq.fill(n)(mask)
      val df = rows.map(r => org.apache.spark.sql.Row.fromSeq(r))
      val schema = org.apache.spark.sql.types.StructType(
        (0 until n).map(i => org.apache.spark.sql.types.StructField(s"c$i", org.apache.spark.sql.types.LongType)))
      val frame = spark.createDataFrame(spark.sparkContext.parallelize(df), schema)
      val bad = frame.select((0 until n).map(i => col(s"c$i")) :+
          Layout.zValueN(spark, (0 until n).map(i => col(s"c$i")): _*).as("z"): _*)
        .collect()
        .filter { r =>
          val expect = (0 until n).flatMap { j =>
            val v = r.getLong(j) & mask
            (0 until width).map(i => ((v >>> i) & 1L) << (n * i + j))
          }.foldLeft(0L)(_ | _)
          r.getLong(n) != expect
        }
      assert(bad.isEmpty, s"n=$n: ${bad.take(3).mkString("; ")}")
    }
    // arity guard: 1 and 9 keys are refused at analysis
    intercept[Exception](spark.sql("SELECT zorder(CAST(1 AS BIGINT))").collect())
  }

  test("clusterByZN on THREE columns: point filters on EACH clustered column skip row groups — measured") {
    // same comparable-bit-width discipline as the 2-column test: three
    // ~8-bit bucketed keys, so every column contributes high interleaved
    // bits. Skipping power divides across dimensions (64 files ≈ 4 ranges
    // PER column in 3-d, vs 8 in 2-d) — the file count must scale with
    // cols clustered, the honest cost of multi-dimension layouts
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"),
        pmod(col("l_orderkey"), lit(256)).as("okey_bucket"),
        pmod((col("l_extendedprice") * 100).cast("long"), lit(256)).as("price_bucket"))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
    Layout.clusterByZN(li, Seq("l_partkey", "okey_bucket", "price_bucket"), numPartitions = 64)
      .write.parquet(s"$base/z")
    li.repartition(64).write.parquet(s"$base/flat")

    // probe MID-domain values: an edge value (min/max of the domain) lets
    // even the random layout prune (files missing the extreme shrink their
    // min/max past it), which would understate the z-layout's advantage
    val probe = li.agg(
      expr("percentile_approx(l_partkey, 0.5)"),
      expr("percentile_approx(okey_bucket, 0.5)"),
      expr("percentile_approx(price_bucket, 0.5)")).head()
    for ((colName, v) <- Seq("l_partkey" -> probe.getLong(0),
        "okey_bucket" -> probe.getLong(1), "price_bucket" -> probe.getLong(2))) {
      val zRows = scanOutputRows(spark.read.parquet(s"$base/z").filter(col(colName) === v))
      val flatRows = scanOutputRows(spark.read.parquet(s"$base/flat").filter(col(colName) === v))
      assert(zRows < flatRows * 0.7,
        s"$colName: z layout read $zRows rows vs $flatRows random — no row-group skipping " +
          s"(skip ratio ${1.0 - zRows.toDouble / flatRows})")
    }
    // the reordering is pure: row multiset identical to the input
    val a = spark.read.parquet(s"$base/z")
    assert(a.exceptAll(li).isEmpty && li.exceptAll(a).isEmpty)
  }

  test("compact: many tiny files become few, content identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber", "l_quantity")
    li.repartition(50).write.parquet(dir) // simulate an append-fragmented sink
    // sort on ALL columns — (orderkey, linenumber) is not unique in the
    // synthetic fixture, and ties would make the comparison order-ambiguous
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1), r.getDouble(2))
    val before = li.collect().toSeq.sortBy(key)
    val (nBefore, nAfter) = Layout.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(nBefore == 50, s"expected 50 input files, saw $nBefore")
    assert(nAfter < 5, s"compaction left $nAfter files")
    val after = spark.read.parquet(dir).collect().toSeq.sortBy(key)
    assert(after == before, "compaction changed the row multiset")
  }

  test("clusterByZ preserves the row multiset and localizes both dimensions per partition") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val clustered = Layout.clusterByZ(li, "l_partkey", "l_suppkey", numPartitions = 8)
    assert(clustered.exceptAll(li).count() == 0 && li.exceptAll(clustered).count() == 0)
    // per-partition bounding boxes must cover far less than the full domain:
    // that shrinkage is exactly what lets parquet min/max prune either column
    val stats = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(
        (max(col("l_partkey")) - min(col("l_partkey")) + 1).as("dx"),
        (max(col("l_suppkey")) - min(col("l_suppkey")) + 1).as("dy"))
      .withColumn("area", col("dx") * col("dy"))
    val global = li.agg(
      (max(col("l_partkey")) - min(col("l_partkey")) + 1) *
        (max(col("l_suppkey")) - min(col("l_suppkey")) + 1)).as[Long].head()
    val meanArea = stats.agg(avg(col("area"))).as[Double].head()
    assert(meanArea < global / 2.0,
      s"mean partition bounding box $meanArea vs global domain $global — no locality gained")
  }

  test("zSurrogate is monotone per type: string prefix order == string order, dates/timestamps exact") {
    import spark.implicits._
    val strings = Seq("", "a", "ab", "abc", "abcdefgh", "abcdefghZ", "b", "ba",
      "zzzzzzzzzzzz", "Z", "0", "~")
    val sGot = strings.toDF("s")
      .select(col("s"), Layout.zSurrogate("s", org.apache.spark.sql.types.StringType).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (a <- strings; b <- strings if a < b)
      assert(sGot(a) <= sGot(b),
        s"string surrogate order broke: '$a' (${sGot(a)}) vs '$b' (${sGot(b)})")
    // distinct within the 7-byte prefix resolution
    assert(sGot("a") < sGot("ab") && sGot("ab") < sGot("b"))

    val dates = Seq("1969-12-31", "1970-01-01", "2024-02-29", "2038-01-19").map(java.sql.Date.valueOf)
    val dGot = dates.toDF("d")
      .select(Layout.zSurrogate("d", org.apache.spark.sql.types.DateType)).as[Long].collect()
    assert(dGot.toSeq == dates.map(_.toLocalDate.toEpochDay), "date surrogate must be the epoch day")
  }
}
