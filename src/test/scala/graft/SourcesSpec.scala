package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources
import graft.catalog.CatalogOps
import graft.gen.AdsDataGenerator

class SourcesSpec extends SparkSpec {

  test("CSV sink + scan round-trips the ads schema (S1/S2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/ads"
    val ads = AdsDataGenerator.generate(spark, AdsDataGenerator.Params(campaigns = 2, days = 3))
    Sources.writeCsv(ads, dir)
    val back = Sources.readCsv(spark, dir, ads.schema)
    assert(back.count() == ads.count())
    // same names/types (nullability legitimately differs: range outputs are non-null)
    assert(back.schema.map(f => (f.name, f.dataType)) == ads.schema.map(f => (f.name, f.dataType)))
    assert(back.except(ads).count() == 0 && ads.except(back).count() == 0)
  }

  test("latestFile picks lexicographically-last matching name (S3)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-files").toString
    Seq("ads_data_2026-08-01A.csv", "ads_data_2026-08-01B.csv", "ads_data_2026-07-31Z.csv",
      "other.csv", "ads_data_x.txt").foreach { n =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$n"), "x")
    }
    val latest = Sources.latestFile(spark, dir, "ads_data_", ".csv")
    assert(latest.exists(_.endsWith("ads_data_2026-08-01B.csv")))
    assert(Sources.latestFile(spark, dir + "/missing", "a", ".csv").isEmpty)
  }

  test("catalog ops: database, CTAS, view, truncate+reload, counts (S9-S13)") {
    CatalogOps.createDatabaseIfNotExists(spark, "graft_test")
    spark.sql("DROP VIEW IF EXISTS graft_test.ads_view")
    spark.sql("DROP TABLE IF EXISTS graft_test.staging_ads")
    val ads = AdsDataGenerator.generate(spark, AdsDataGenerator.Params(campaigns = 2, days = 2))

    CatalogOps.ctas(ads, "graft_test.staging_ads")
    assert(CatalogOps.rowCount(spark, "graft_test.staging_ads") == ads.count())

    // create-if-absent is a no-op when the table exists
    CatalogOps.createTableIfNotExists(ads, "graft_test.staging_ads")
    assert(CatalogOps.rowCount(spark, "graft_test.staging_ads") == ads.count())

    CatalogOps.createOrReplaceView(spark, "graft_test.ads_view", "graft_test.staging_ads")
    assert(CatalogOps.rowCount(spark, "graft_test.ads_view") == ads.count())

    // truncate+reload with a smaller batch: table ends up exactly the new batch
    val half = ads.filter(col("campaign_id") === 1)
    CatalogOps.truncateReload(half, "graft_test.staging_ads")
    assert(CatalogOps.rowCount(spark, "graft_test.staging_ads") == half.count())
  }
}
