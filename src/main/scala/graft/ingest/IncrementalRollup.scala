package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate rollup — the materialized-view move
  * for append-only facts: instead of recomputing `GROUP BY` over the whole
  * fact table on every load (O(sink) per batch — the reference's notebook
  * re-aggregates its full table every run,
  * `analytics_reports/analytics_reports.ipynb` cell 2), keep a small table
  * of mergeable partial-aggregate STATE per group and fold each batch in:
  * O(batch + touched groups) per load, independent of fact-table size.
  *
  * State per measure m: `sum_m` (decimal-summed — engine-exact and
  * order-independent), `cnt_m`, `min_m`, `max_m`. All four are
  * commutative-monoid merges, so batch order cannot change the result and
  * re-folding a batch is detectable upstream (pair with
  * [[IncrementalLoader.appendNew]], which already guarantees each row is
  * appended once). Derived measures that are NOT mergeable (avg) are
  * finalized at read from the state — never stored.
  *
  * Append-only by design: retractions (deletes/updates of facts) would need
  * subtractable state (no min/max) or a recompute of touched groups — out
  * of scope, like every eventually-consistent rollup of this shape.
  *
  * At 100 TB: the state table is O(groups), each merge shuffles only
  * O(batch groups) rows, and the fold is one union + one map-side-combined
  * aggregation — no join, no fact-table scan.
  */
object IncrementalRollup {

  private def stateCols(measures: Seq[String]): Seq[String] =
    measures.flatMap(m => Seq(s"sum_$m", s"cnt_$m", s"min_$m", s"max_$m"))

  /** Partial-aggregate state of one batch of facts. */
  def aggState(batch: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "rollup needs keys and measures")
    val aggs = measures.flatMap { m =>
      Seq(graft.analytics.Analytics.dsum(col(m)).as(s"sum_$m"),
        count(col(m)).as(s"cnt_$m"),
        min(col(m)).as(s"min_$m"),
        max(col(m)).as(s"max_$m"))
    }
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a batch's state into the existing state: union + re-aggregate —
    * sums add, counts add, mins min, maxes max. One shuffle of
    * O(state groups + batch groups) slim rows.
    */
  def mergeState(state: DataFrame, delta: DataFrame,
      keys: Seq[String], measures: Seq[String]): DataFrame = {
    val aggs = measures.flatMap { m =>
      Seq(graft.analytics.Analytics.dsum(col(s"sum_$m")).as(s"sum_$m"),
        sum(col(s"cnt_$m")).as(s"cnt_$m"),
        min(col(s"min_$m")).as(s"min_$m"),
        max(col(s"max_$m")).as(s"max_$m"))
    }
    val cols = (keys ++ stateCols(measures)).map(col)
    state.select(cols: _*).unionByName(delta.select(cols: _*))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The user-facing view of the state: the mergeable columns plus the
    * finalized derived measures (avg, rounded like every compared ratio).
    */
  def finalize(state: DataFrame, measures: Seq[String], avgDecimals: Int = 6): DataFrame =
    measures.foldLeft(state)((df, m) =>
      df.withColumn(s"avg_$m",
        round(col(s"sum_$m") / nullif(col(s"cnt_$m").cast("double"), lit(0.0)), avgDecimals)))
}
