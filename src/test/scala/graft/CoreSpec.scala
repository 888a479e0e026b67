package graft

import org.apache.spark.sql.functions._
import graft.transform.KpiTransform
import graft.ingest.IncrementalLoader
import graft.gen.AdsDataGenerator

class KpiTransformSpec extends SparkSpec {
  import spark.implicits._

  test("safeDiv: ÷0 yields 0 (not NULL), NULL denominator yields 0") {
    val df = Seq(
      (10L, 5L), (10L, 0L), (0L, 0L)
    ).toDF("n", "d")
      .union(Seq((7L, 0L)).toDF("n", "d").withColumn("d", lit(null).cast("long")))
    val out = df.select(KpiTransform.safeDiv(col("n"), col("d")).as("r")).as[Double].collect()
    assert(out.toSeq == Seq(2.0, 0.0, 0.0, 0.0))
  }

  test("withKpis derives ctr/cpm/cpc/cpa with reference semantics") {
    val row = Seq((1L, 1L, 1L, 1000L, 50L, 20.0, 5L))
      .toDF("campaign_id", "adset_id", "creative_id", "impressions", "clicks", "spend", "conversions")
    val r = KpiTransform.withKpis(row).select("ctr", "cpm", "cpc", "cpa").as[(Double, Double, Double, Double)].head()
    assert(r == ((0.05, 20.0, 0.4, 4.0)))
  }

  test("withKpis: zero denominators → all-zero KPIs (transform_staging.py:35-38)") {
    val row = Seq((1L, 1L, 1L, 0L, 0L, 20.0, 0L))
      .toDF("campaign_id", "adset_id", "creative_id", "impressions", "clicks", "spend", "conversions")
    val r = KpiTransform.withKpis(row).select("ctr", "cpm", "cpc", "cpa").as[(Double, Double, Double, Double)].head()
    assert(r == ((0.0, 0.0, 0.0, 0.0)))
  }
}

class IncrementalLoaderSpec extends SparkSpec {

  test("appendNew is idempotent: second load of the same batch inserts 0 rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inc").toString + "/sink"
    val batch = AdsDataGenerator.generate(spark, AdsDataGenerator.Params(campaigns = 3, days = 5))
    val n1 = IncrementalLoader.appendNew(spark, batch, dir)
    val n2 = IncrementalLoader.appendNew(spark, batch, dir)
    assert(n1 == 3 * 5 * 3 * 5)
    assert(n2 == 0)
    assert(spark.read.parquet(dir).count() == n1)
  }

  test("appendNew is idempotent for rows with NULL dt keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-inc-null").toString + "/sink"
    val batch = Seq(
      (1L, 1L, 1L, Some("2026-08-01")),
      (2L, 1L, 1L, None) // null dt — must not re-append on the second run
    ).toDF("campaign_id", "adset_id", "creative_id", "dt")
      .withColumn("dt", col("dt").cast("date"))
    val n1 = IncrementalLoader.appendNew(spark, batch, dir)
    val n2 = IncrementalLoader.appendNew(spark, batch, dir)
    assert(n1 == 2)
    assert(n2 == 0, "null-dt rows re-appended — anti-join is not null-safe")
    assert(spark.read.parquet(dir).count() == 2)

    // all-null-dt batch: second run must still be a no-op (not treat all as new)
    val nullBatch = Seq((3L, 1L, 1L)).toDF("campaign_id", "adset_id", "creative_id")
      .withColumn("dt", lit(null).cast("date"))
    val m1 = IncrementalLoader.appendNew(spark, nullBatch, dir)
    val m2 = IncrementalLoader.appendNew(spark, nullBatch, dir)
    assert(m1 == 1 && m2 == 0)
  }

  test("upsert replaces matched keys, inserts new ones, keeps the rest") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val got = IncrementalLoader.upsert(target, updates, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "Z")))
    // NULL keys upsert in place too (null-safe match), never duplicate
    val tN = Seq((Option.empty[Long], "n"), (Some(1L), "a")).toDF("k", "v")
    val uN = Seq((Option.empty[Long], "N")).toDF("k", "v")
    val gotN = IncrementalLoader.upsert(tN, uN, Seq("k"))
      .orderBy(col("k").asc_nulls_first).as[(Option[Long], String)].collect().toSeq
    assert(gotN == Seq((None, "N"), (Some(1L), "a")))
  }

  test("mergeIntoSink is idempotent and rewrites only touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString + "/sink"
    val base = AdsDataGenerator.generate(spark, AdsDataGenerator.Params(campaigns = 2, days = 4))
    IncrementalLoader.mergeIntoSink(spark, base, dir)
    val total = base.count()
    assert(spark.read.parquet(dir).count() == total)

    // batch: one day's rows with spend zeroed + one brand-new key that day
    val day = base.select(max(col("dt"))).collect()(0).getDate(0).toString
    val touched = base.filter(col("dt") === day).withColumn("spend", lit(0.0))
    val fresh = touched.limit(1).withColumn("campaign_id", lit(999L))
    val batch = touched.unionByName(fresh)
    // untouched partitions keep files: record one untouched day's rows
    val otherDayRows = spark.read.parquet(dir).filter(col("dt") =!= day).count()

    IncrementalLoader.mergeIntoSink(spark, batch, dir)
    val after = spark.read.parquet(dir)
    assert(after.count() == total + 1)
    assert(after.filter(col("dt") === day && col("spend") =!= 0.0).count() == 0,
      "matched rows not updated in place")
    assert(after.filter(col("dt") =!= day).count() == otherDayRows)

    // run the same merge again: nothing changes (idempotence)
    IncrementalLoader.mergeIntoSink(spark, batch, dir)
    val again = spark.read.parquet(dir)
    assert(again.count() == total + 1)
    assert(again.filter(col("dt") === day && col("spend") =!= 0.0).count() == 0)
  }

  test("appendNew appends only the delta for a partially-overlapping batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inc2").toString + "/sink"
    val p = AdsDataGenerator.Params(campaigns = 2, days = 4)
    val batch = AdsDataGenerator.generate(spark, p)
    val firstHalf = batch.filter(col("dt") <= "2026-08-10")
    IncrementalLoader.appendNew(spark, firstHalf, dir)
    val n2 = IncrementalLoader.appendNew(spark, batch, dir)
    assert(n2 == batch.count() - firstHalf.count())
    assert(spark.read.parquet(dir).count() == batch.count())
  }
}

class AdsDataGeneratorSpec extends SparkSpec {

  test("generator invariants: bounds + constraint chain (generate_ads_data.py:22-25)") {
    val df = AdsDataGenerator.generate(spark, AdsDataGenerator.Params(campaigns = 5, days = 10)).cache()
    try {
      assert(df.count() == 5 * 5 * 3 * 10)
      val bad = df.filter(
        col("impressions") < 500 || col("impressions") > 5000 ||
          col("clicks") < 0 || col("clicks") > col("impressions") * 0.2 ||
          col("spend") < 10.0 || col("spend") > 200.0 ||
          col("conversions") < 0 || col("conversions") > col("clicks"))
      assert(bad.count() == 0)
      // 2dp money
      assert(df.filter(round(col("spend"), 2) =!= col("spend")).count() == 0)
    } finally df.unpersist()
  }

  test("generator is deterministic for a fixed seed") {
    val p = AdsDataGenerator.Params(campaigns = 3, days = 3)
    val a = AdsDataGenerator.generate(spark, p)
    val b = AdsDataGenerator.generate(spark, p)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
