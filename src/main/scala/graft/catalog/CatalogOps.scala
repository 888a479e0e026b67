package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog/DDL surface covering SURVEY.md §2.1 S9-S13 — the reference's
  * idempotent DDL, CTAS, view, truncate+reload, and schema creation, mapped
  * to the Spark catalog.
  */
object CatalogOps {

  /** S13: CREATE SCHEMA IF NOT EXISTS (transform_staging.py:20-21). */
  def createDatabaseIfNotExists(spark: SparkSession, name: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name")
    ()
  }

  /** S9: create-table-if-absent from a DataFrame's schema — mode("ignore")
    * is the no-throw analogue of the reference's swallow-ORA-955 PL/SQL
    * (README.md:202-218) / CREATE TABLE IF NOT EXISTS
    * (oracle_to_snowflake.py:63-74).
    */
  def createTableIfNotExists(df: DataFrame, table: String): Unit =
    df.limit(0).write.mode("ignore").saveAsTable(table)

  /** S10: CREATE OR REPLACE TABLE AS SELECT (transform_staging.py:24-40). */
  def ctas(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").saveAsTable(table)

  /** S11: CREATE OR REPLACE VIEW ... AS SELECT * (transform_staging.py:43-46). */
  def createOrReplaceView(spark: SparkSession, view: String, sourceTable: String): Unit = {
    spark.sql(s"CREATE OR REPLACE VIEW $view AS SELECT * FROM $sourceTable")
    ()
  }

  /** S12: TRUNCATE + INSERT INTO ... SELECT refresh (README.md:328,377-385)
    * — one atomic dynamic overwrite instead of the reference's two-statement
    * window where readers can observe an empty table.
    */
  def truncateReload(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").insertInto(table)

  /** A4: COUNT(*) sanity check after a load (transform_staging.py:49-51). */
  def rowCount(spark: SparkSession, table: String): Long =
    spark.table(table).count()

  /** Bucketed CTAS: co-locates rows by `keys` into `buckets` files per
    * partition so later equi-joins/aggregations on those keys need NO
    * shuffle — the 100 TB answer to a repeated big-big join (SURVEY.md §7:
    * "bucketing for co-located joins"). Both sides must be bucketed the same
    * way; see CatalogSpec for the shuffle-free plan assertion.
    */
  def saveBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
}
