package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 history apply — the versioned complement of
  * [[IncrementalLoader.upsert]] (SCD1 overwrites in place; SCD2 keeps every
  * version with a validity interval). The reference's TRUNCATE+reload keeps
  * no history at all; a lakehouse dimension table needs this operator.
  *
  * Contract: `target` carries `valid_from`/`valid_to` DateType columns with
  * `valid_to IS NULL` marking the open (current) version — at most one open
  * row per key. A batch row whose values differ (null-safely) from the
  * key's open version closes it at `effective` and opens a new version;
  * identical values are a no-op (idempotence); keys absent from the target
  * open fresh.
  */
object Scd2 {

  /** @param keys      business key columns (shared by target and updates)
    * @param valueCols tracked attribute columns (shared by target and updates)
    * @param effective the new version's valid_from / the old version's valid_to
    * @return the full new history: closed rows untouched, changed opens
    *         closed, new versions opened
    */
  def applyScd2(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String],
      effective: Column): DataFrame = {
    require(keys.nonEmpty, "SCD2 needs at least one key column")
    val outCols = (keys ++ valueCols ++ Seq("valid_from", "valid_to")).map(col)

    val open = target.filter(col("valid_to").isNull)
    val closed = target.filter(col("valid_to").isNotNull)

    // ONE full-outer hash join open⋈batch on the key (batch side
    // broadcastable); a change is any null-safe value difference. Side
    // presence is marked with literal-1 probe columns — value nullness can't
    // distinguish "no batch row" from "batch row carrying NULL".
    val b = updates.select((keys ++ valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(v => v -> s"__new_$v").toMap)
    val differs = valueCols.map(v => !(col(v) <=> col(s"__new_$v"))).reduce(_ || _)
    val withMarks = open.withColumn("__in_open", lit(1))
      .join(b.withColumn("__in_batch", lit(1)), keys, "full_outer")

    val keepOpen = withMarks.filter(col("__in_open") === 1 &&
        (col("__in_batch").isNull || !differs))
      .select(outCols: _*)
    val closedNow = withMarks.filter(col("__in_open") === 1 && col("__in_batch") === 1 && differs)
      .select((keys.map(col) ++ valueCols.map(col) :+
        col("valid_from") :+ effective.cast("date").as("valid_to")): _*)
    val opened = withMarks.filter(col("__in_batch") === 1 &&
        (col("__in_open").isNull || differs))
      .select((keys.map(col) ++ valueCols.map(v => col(s"__new_$v").as(v)) :+
        effective.cast("date").as("valid_from") :+ lit(null).cast("date").as("valid_to")): _*)

    closed.select(outCols: _*)
      .unionByName(keepOpen)
      .unionByName(closedNow)
      .unionByName(opened)
  }
}
