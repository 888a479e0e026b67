package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** File + JDBC sources/sinks covering SURVEY.md §2.1:
  *
  * - S1/S2: header CSV sink/scan with an explicit schema (never dtype
  *   inference at scale — one schema, validated at the boundary, like the
  *   reference's fixed DDL).
  * - S3: latest-file discovery (`scripts/insert_ads_data.py:6-8` lists a dir,
  *   filters prefix/suffix, sorts, takes last) — driver-side FS metadata op,
  *   not a data-plane job.
  * - S4-S8: the reference's Oracle/Snowflake endpoints map to Spark's JDBC
  *   source/sink; the engine's tests run on the parquet stand-ins, the JDBC
  *   path shares the same call shape (`README.md:89-94,283` in the
  *   reference for the endpoints it talks to).
  */
object Sources {

  /** S2: CSV scan with explicit schema + header (insert_ads_data.py:10). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S1: CSV sink with header (generate_ads_data.py:55). */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** JSON-lines scan with explicit schema — same no-inference boundary rule
    * as CSV: schema inference over JSON is a full extra pass at 100 TB and
    * silently widens types on dirty data.
    */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** ORC scan/sink — the other columnar format Spark ships natively; same
    * predicate-pushdown and column-pruning behavior as parquet, so the
    * engine's scan-side design notes carry over unchanged.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** Line-oriented text-corpus ingestion: one document per line, content-
    * addressed ids (xxhash64 of source file ⊕ line text) — stable across
    * re-reads and partitionings, unlike zip-with-index schemes, and the
    * natural key for the exact-dedup stage that follows ingestion anyway.
    * Output: (doc_id, text, source).
    */
  def readTextCorpus(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.text(dir)
      .withColumn("source", input_file_name())
      .select(xxhash64(col("source"), col("value")).as("doc_id"),
        col("value").as("text"), col("source"))
  }

  /** S3: newest file in `dir` matching prefix/suffix by lexicographic name
    * order (the reference's versioned `ads_data_<date><A..Z>.csv` naming
    * makes name order = recency order, insert_ads_data.py:7-8).
    */
  def latestFile(spark: SparkSession, dir: String, prefix: String, suffix: String): Option[String] = {
    val p = new Path(dir)
    val fs: FileSystem = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else
      fs.listStatus(p)
        .iterator
        .map(_.getPath)
        .filter(f => f.getName.startsWith(prefix) && f.getName.endsWith(suffix))
        .toSeq
        .sortBy(_.getName)
        .lastOption
        .map(_.toString)
  }

  /** S4/S5: JDBC scan (projection/predicates push into the remote query via
    * Catalyst's JDBC pruning). `partitionOn` enables parallel reads — at
    * scale a single-connection JDBC read is the bottleneck, so partition on
    * a numeric key with bounds.
    */
  def readJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty,
      partitionOn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = props.foldLeft(spark.read.format("jdbc").option("url", url).option("dbtable", table)) {
      case (r: DataFrameReader, (k, v)) => r.option(k, v)
    }
    partitionOn
      .fold(base) { case (col, lo, hi, n) =>
        base
          .option("partitionColumn", col)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", n)
      }
      .load()
  }

  /** S5/S6 extract normalization (`scripts/oracle_to_snowflake.py:38-43`):
    * the live Oracle table spells the date column `EVENT_DATE`, the staging
    * contract spells it `DT` and normalizes to day precision before any key
    * comparison. Pair with [[AdsJdbcDialect.register]] for the NUMBER-family
    * type mapping.
    */
  def readAdsExtract(
      spark: SparkSession,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val raw = readJdbc(spark, url, table, props)
    val renamed =
      if (raw.columns.contains("EVENT_DATE")) raw.withColumnRenamed("EVENT_DATE", "DT")
      else raw
    if (renamed.columns.contains("DT"))
      renamed.withColumn("DT", org.apache.spark.sql.functions.col("DT").cast("date"))
    else renamed
  }

  /** S7/S8: batched JDBC append (the reference's executemany,
    * oracle_to_snowflake.py:104-110; batchsize replaces hand-batching).
    */
  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty,
      batchSize: Int = 10000,
      mode: String = "append"): Unit =
    props
      .foldLeft(
        df.write.format("jdbc").mode(mode)
          .option("url", url).option("dbtable", table)
          .option("batchsize", batchSize.toString)) { case (w, (k, v)) => w.option(k, v) }
      .save()
}
