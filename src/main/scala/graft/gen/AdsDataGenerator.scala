package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed, seeded re-implementation of the reference's synthetic AdTech
  * generator (`scripts/generate_ads_data.py:8-36` — 50 campaigns × 5 adsets ×
  * 3 creatives × 60 days, uniform metrics with the constraints
  * clicks ≤ 0.2·impressions and conversions ≤ clicks).
  *
  * The reference materializes the 4-deep nested loop in driver Python; here
  * the dimensional cross product is declared as `spark.range` cross joins
  * (SURVEY.md §2.3 J2) so Catalyst plans it as a chain of
  * BroadcastNestedLoopJoins and the row synthesis runs data-parallel on
  * executors — at 100 TB-scale parameters the generator is embarrassingly
  * parallel instead of a single-threaded loop.
  *
  * Determinism: all randomness is `rand(seed)` with distinct fixed seeds, so
  * the same (seed, params) always produces the same dataset — a prerequisite
  * for the idempotent-ingest tests (SURVEY.md §5.1 invariant i).
  */
object AdsDataGenerator {

  final case class Params(
      campaigns: Int = 50,
      adsetsPerCampaign: Int = 5,
      creativesPerAdset: Int = 3,
      days: Int = 60,
      endDate: String = "2026-08-12", // fixed anchor: reference uses today() (nondeterministic F7); we pin it
      seed: Long = 42L)

  /** Full cross product of the dimensional hierarchy × day series, with
    * seeded uniform metrics. Output schema matches FIXTURES.md §1:
    * (campaign_id, adset_id, creative_id, dt, impressions, clicks, spend,
    * conversions).
    */
  def generate(spark: SparkSession, p: Params = Params()): DataFrame = {
    val campaigns = spark.range(1, p.campaigns + 1L).toDF("campaign_id")
    val adsets    = spark.range(1, p.adsetsPerCampaign + 1L).toDF("adset_id")
    val creatives = spark.range(1, p.creativesPerAdset + 1L).toDF("creative_id")
    // 60-day contiguous series ending at the anchor (generate_ads_data.py:14,21)
    val dates = spark
      .range(0, p.days.toLong)
      .select(date_sub(to_date(lit(p.endDate)), lit(p.days - 1) - col("id").cast("int")).as("dt"))

    campaigns
      .crossJoin(adsets)
      .crossJoin(creatives)
      .crossJoin(dates)
      // uniform [500, 5000] (generate_ads_data.py:22)
      .withColumn("impressions", floor(rand(p.seed) * 4501 + 500).cast("long"))
      // uniform [0, int(0.2·impressions)] — floor the bound first, matching
      // randint(0, int(impressions*0.2)) (generate_ads_data.py:23)
      .withColumn("clicks", floor(rand(p.seed + 1) * (floor(col("impressions") * 0.2) + 1)).cast("long"))
      // uniform [10.00, 200.00] rounded to 2dp (generate_ads_data.py:24, F12)
      .withColumn("spend", round(rand(p.seed + 2) * 190 + 10, 2))
      // uniform [0, clicks] (generate_ads_data.py:25)
      .withColumn("conversions", floor(rand(p.seed + 3) * (col("clicks") + 1)).cast("long"))
  }
}
