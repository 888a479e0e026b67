package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.transform.KpiTransform

/** The reference's analytics surface (notebook cells 3-5; `README.md:396-418`)
  * re-expressed over the driver fixtures: `events` plays the ADS_DATA fact
  * role (FIXTURES.md §3), with (user_id, dt) standing in for
  * (campaign_id, dt).
  *
  * Determinism rules (SURVEY.md §7.5): the reference anchors lookbacks at
  * `CURRENT_DATE` (nondeterministic F7) — we anchor at `max(dt)` of the data
  * via a scalar-subquery-style join so runs are reproducible; every ORDER BY
  * carries a key tiebreaker; every money aggregate sums as DECIMAL(18,2)
  * (exact, summation-order-independent — double sums drift ~1e-4 at 600k
  * rows, enough to cross a rounding boundary) and casts back to double.
  */
object Analytics {

  /** Exact money sum: decimal accumulation, double result. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Fixed-width numeric histogram: one map-side-combined aggregation, bins
    * keyed by `floor(value / width)` — the profiling primitive for choosing
    * partition bounds / spotting skew before a 100 TB run. Money totals sum
    * through decimal (dsum) so the histogram is engine-exact.
    */
  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    df.groupBy(floor(col(valueCol) / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), dsum(col(valueCol)).as("total"))
      .orderBy(col("bin"))
  }

  /** Daily ads-shaped rollup of events: one row per (user_id, dt) with
    * impressions/clicks/spend/conversions semantics:
    * impressions = events, clicks = 'click' events, spend = sum(value),
    * conversions = 'purchase' events. This is the engine's staging grain.
    */
  def dailyAds(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("dt"))
      .agg(
        count(lit(1)).as("impressions"),
        count(when(col("event_type") === "click", 1)).as("clicks"),
        dsum(col("value")).as("spend"),
        count(when(col("event_type") === "purchase", 1)).as("conversions"))

  /** Curated layer = dailyAds + the 4 KPI columns with ÷0→0 semantics
    * (transform_staging.py:25-39).
    */
  def campaignDailyMetrics(spark: SparkSession, sfDir: String): DataFrame =
    KpiTransform.withKpis(dailyAds(spark, sfDir))

  /** Notebook cell 3: top-10 "campaigns" by spend in the trailing 14 days
    * (anchored at max(dt), inclusive — 14 calendar days = anchor-13..anchor).
    */
  def topCampaignsBySpend(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    // Resolve the anchor to a LITERAL first (one tiny max() job): a
    // data-derived join bound — and any predicate on the computed `dt` —
    // can never reach the parquet scan. Translating the cutoff to the raw
    // nanos column gives the main scan a PushedFilters row-group bound:
    // O(matching data), not O(table), at 100 TB. Collected as a string
    // (java.sql.Date would materialize in the JVM-default tz).
    val loStr = ev.agg(date_sub(max(col("dt")), 13).cast("string")).collect()(0).getString(0)
    if (loStr == null) return ev.filter(lit(false))
      .groupBy(col("user_id")).agg(dsum(col("value")).as("total_spend"))
    // dt >= lo  <=>  instant >= midnight(lo) IN THE SESSION TIMEZONE (dt is
    // ts.cast(date), which is tz-dependent)  <=>  ts >= midnight-epoch µs.
    // The predicate targets `ts` (the STORED column in the current µs
    // fixture, so it lands in PushedFilters); on the legacy nanos fixture
    // ts is floor(ns/1000) µs, for which `ts >= micros(lo)` is still exact
    // at any epoch sign (true floor division in Tables.events — a
    // toward-zero `div` would round pre-1970 nanos up and misclassify rows
    // within 1µs of the midnight boundary).
    val sessionTz = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    val loMicros = java.time.LocalDate.parse(loStr)
      .atStartOfDay(sessionTz).toInstant.toEpochMilli * 1000L
    ev.filter(col("ts") >= timestamp_micros(lit(loMicros)))
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("total_spend"))
      .orderBy(col("total_spend").desc, col("user_id"))
      .limit(k)
  }

  /** The data side of the reference's reporting notebook
    * (analytics_reports.ipynb cells 3-6): every frame its charts plot,
    * exported as headered single-file CSVs ready for any plotting
    * environment. Chart RENDERING stays out of engine scope (matplotlib is
    * not a query operator); this closes everything up to the pixels — a
    * notebook user points pandas/matplotlib at `outDir` and reproduces the
    * report.
    */
  def exportReportData(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val frames = Seq(
      "top_campaigns_by_spend" -> topCampaignsBySpend(spark, sfDir),
      "daily_ctr_trend" -> dailyCtrTrend(spark, sfDir),
      "creative_scorecard" -> creativeScorecard(spark, sfDir))
    frames.foreach { case (name, df) =>
      // reports are human-scale (top-k / daily grains): one file per chart
      df.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(s"$outDir/$name")
    }
  }

  /** Notebook cell 4: daily mean CTR trend, ordered by day. */
  def dailyCtrTrend(spark: SparkSession, sfDir: String): DataFrame =
    campaignDailyMetrics(spark, sfDir)
      .groupBy(col("dt"))
      .agg(round(avg(col("ctr")), 6).as("avg_ctr"))
      .orderBy(col("dt"))

  /** Notebook cell 5: per-"creative" (event_type) scorecard with multiple
    * aggregates, top-10 by volume.
    */
  def creativeScorecard(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("impressions"),
        dsum(col("value")).as("total_value"),
        (dsum(col("value")) / count(lit(1))).as("avg_value"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("impressions").desc, col("event_type"))
      .limit(k)

  /** Time-series densification: one row per (key, day) for EVERY day in the
    * table's [min, max] date span, observed days aggregated by `agg`,
    * missing days gap-filled by last-observation-carried-forward (NULL
    * before a key's first observation — fabricating a value there would be
    * a lie). The standard prep for charting, forecasting, or joining
    * against a calendar feed: downstream consumers get a dense grid.
    *
    * Scale shape: ONE pass over the fact table (the map-side-combined daily
    * aggregate); the date bounds, key list, spine, and grid all derive from
    * that (days × distinct keys)-sized frame — deriving them from `df`
    * instead would re-scan the fact table three times for metadata-scale
    * answers (.explain showed exactly that before the daily frame was
    * shared). The forward-fill window partitions by key over the bounded
    * day span, so no task ever sorts more than one key's calendar. Eager
    * (the shared daily frame is released before returning).
    */
  def densifyDaily(
      df: DataFrame,
      keyCol: String,
      dateCol: String,
      agg: Column,
      outName: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), col(dateCol).as("day")).agg(agg.as("__obs"))
      .persist()
    val spine = daily.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val grid = daily.select(col(keyCol)).distinct().crossJoin(spine)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Long.MinValue, 0)
    val out = grid.join(daily, Seq(keyCol, "day"), "left")
      .withColumn(outName, last(col("__obs"), ignoreNulls = true).over(w))
      .drop("__obs")
    graft.util.Caching.materialize(out, daily)
  }

  /** Per-column data profile — null count, exact distinct count, min/max —
    * in ONE pass over the table (multiple exact distincts plan as one
    * Expand-backed aggregate: the scan is read once, expanded ×columns in
    * the exchange; exact-by-construction, the profiling contract). Numeric
    * bounds are canonicalized through DECIMAL(38,6) so the stringified
    * profile is engine-portable (raw double→string formatting is not);
    * dates/strings stringify directly.
    *
    * This is the schema-drift / data-quality gate a 100 TB ingest runs
    * before promoting a batch: nulls where there were none, cardinality
    * collapse, or out-of-range bounds all surface here.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val unknown = cols.filterNot(df.columns.contains)
    require(unknown.isEmpty, s"profileColumns: no such column(s): ${unknown.mkString(", ")}")
    def canon(c: Column, name: String): Column =
      df.schema(name).dataType match {
        case _: org.apache.spark.sql.types.NumericType => c.cast("decimal(38,6)").cast("string")
        case _ => c.cast("string")
      }
    // internal aliases are INDEX-based and user names are backtick-escaped
    // on reference / literal on output — a column named `it's` or `a.b`
    // never reaches any string-parsed identifier unquoted
    def exact(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(exact(c)).as(s"__nn_$i"),
        count_distinct(exact(c)).as(s"__nd_$i"),
        canon(min(exact(c)), c).as(s"__mn_$i"),
        canon(max(exact(c)), c).as(s"__mx_$i"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        (col("__n") - col(s"__nn_$i")).as("null_count"),
        col(s"__nd_$i").as("distinct_count"),
        col(s"__mn_$i").as("min_value"),
        col(s"__mx_$i").as("max_value"))
    }
    row.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
