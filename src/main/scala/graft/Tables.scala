package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical table loaders for the driver-provided parquet fixtures
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * Date-like columns ship as timestamps in the parquet footers; the
  * reference's grain is DATE (`README.md:111`, `scripts/insert_ads_data.py:40`
  * in the reference), so we cast at scan — the cast is a narrow projection
  * that stays inside the parquet scan's whole-stage codegen and does not
  * block column pruning or predicate pushdown on other columns.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** lineitem with `l_shipdate` normalized to DateType. */
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "lineitem")
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))

  /** orders with `o_orderdate` normalized to DateType. */
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "orders")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))

  def customer(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "customer")

  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "supplier")

  def part(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "part")

  def nation(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "nation")

  def region(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "region")

  /** events with both the raw timestamp and a derived `dt` DateType column —
    * this table plays the reference's `ADS_DATA` fact role (FIXTURES.md §3).
    *
    * The fixture's `ts` is TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects by default — read it as nanos-since-epoch Long and convert to a
    * microsecond timestamp with integer division (`div`, not `/` — double
    * division would lose precision above 2^53).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      // keep the RAW nanos column: `ts`/`dt` are computed, so predicates on
      // them can never reach the parquet scan — time-range queries filter
      // ts_nanos (a pure rename of the stored column) and get PushedFilters
      .withColumn("ts_nanos", col("ts"))
      // FLOOR division, not `div` (which truncates toward zero): for
      // pre-1970 instants a toward-zero truncation rounds nanos UP to the
      // next microsecond, so `ts >= micros(lo) <=> ts_nanos >= lo·1000`
      // would break within 1µs of a bound. (x − pmod(x,1000)) div 1000 is
      // exact floor for any sign and stays in integer arithmetic (double
      // division would lose precision above 2^53).
      .withColumn("ts", timestamp_micros(expr("(ts_nanos - pmod(ts_nanos, 1000)) div 1000")))
      .withColumn("dt", col("ts").cast("date"))
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings")
}
