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
  * The full state (with min/max) is append-only by design: min/max are not
  * subtractable, so retracting a fact from them needs a recompute of
  * touched groups or a value-multiset state. Retractions ARE supported for
  * the subtractable aggregates through the signed variants
  * ([[signedAggState]]/[[mergeSignedState]]): rows carry ±n multiplicities
  * (the same Z-relation algebra as [[IncrementalJoin]]'s signed view),
  * sums fold `m·mult`, counts fold the multiplicities, and fully-retracted
  * groups vanish from the state. avg finalizes from sum/cnt as usual.
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
    * Works on both the append-only and the signed state (avg = sum/cnt
    * either way).
    */
  def finalize(state: DataFrame, measures: Seq[String], avgDecimals: Int = 6): DataFrame =
    measures.foldLeft(state)((df, m) =>
      df.withColumn(s"avg_$m",
        round(col(s"sum_$m") / nullif(col(s"cnt_$m").cast("double"), lit(0.0)), avgDecimals)))

  // ------------------------------------------------- signed (retractions)

  private def signedStateCols(measures: Seq[String]): Seq[String] =
    "rows_net" +: measures.flatMap(m => Seq(s"sum_$m", s"cnt_$m"))

  /** Signed partial-aggregate state of one batch whose rows carry `multCol`
    * (+n insert, −n retract): per group, `rows_net` = Σ mult (the group's
    * liveness), `sum_m` = Σ m·mult (decimal-summed, so a retraction cancels
    * its insert EXACTLY, no float residue), `cnt_m` = Σ mult over non-NULL
    * m. Deliberately no min/max — they are not subtractable; the
    * append-only [[aggState]] remains their path.
    */
  def signedAggState(batch: DataFrame, keys: Seq[String], measures: Seq[String],
      multCol: String = "mult"): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "rollup needs keys and measures")
    val aggs = sum(col(multCol)).as("rows_net") +: measures.flatMap { m =>
      Seq(graft.analytics.Analytics.dsum(col(m) * col(multCol)).as(s"sum_$m"),
        sum(when(col(m).isNotNull, col(multCol)).otherwise(0L)).as(s"cnt_$m"))
    }
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a signed batch state into the signed state: everything adds, and
    * groups whose net row multiplicity AND every count reach zero are
    * dropped — the state tracks LIVE groups, not delivery history. (A group
    * at rows_net 0 with a non-zero count is a transient of out-of-order
    * delivery; it stays visible until the matching deltas arrive.)
    */
  def mergeSignedState(state: DataFrame, delta: DataFrame,
      keys: Seq[String], measures: Seq[String]): DataFrame = {
    val aggs = sum(col("rows_net")).as("rows_net") +: measures.flatMap { m =>
      Seq(graft.analytics.Analytics.dsum(col(s"sum_$m")).as(s"sum_$m"),
        sum(col(s"cnt_$m")).as(s"cnt_$m"))
    }
    val cols = (keys ++ signedStateCols(measures)).map(col)
    val dead = col("rows_net") === 0L &&
      measures.map(m => col(s"cnt_$m") === 0L).reduce(_ && _)
    state.select(cols: _*).unionByName(delta.select(cols: _*))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .filter(!dead)
  }

  // ---------------------------------------------- sketch state (distinct)

  /** Mergeable APPROX-DISTINCT state: one DataSketches HLL sketch per
    * (group, column) — the warehouse move for incremental COUNT(DISTINCT),
    * which has no mergeable exact form (a distinct count per batch cannot
    * be added). Sketch union is associative and commutative, so fold order
    * cannot change the result; estimates are EXACT while a sketch is still
    * in its coupon (sparse) regime — up to 2^lgConfigK/4 distincts (4096
    * at the default) — and ±~1% beyond, with state bounded at
    * O(2^lgConfigK) bytes per group either way. At 100 TB this is the
    * difference between a per-load shuffle of O(batch groups) sketch blobs
    * and re-scanning the fact table for every refreshed distinct count.
    */
  def distinctState(batch: DataFrame, keys: Seq[String], cols: Seq[String],
      lgConfigK: Int = 14): DataFrame = {
    require(keys.nonEmpty && cols.nonEmpty, "distinct rollup needs keys and columns")
    val aggs = cols.map(c => hll_sketch_agg(col(c), lit(lgConfigK)).as(s"hll_$c"))
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a batch's sketch state in: union the sketches per group. */
  def mergeDistinctState(state: DataFrame, delta: DataFrame,
      keys: Seq[String], cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => hll_union_agg(col(s"hll_$c"), lit(false)).as(s"hll_$c"))
    val sel = (keys ++ cols.map(c => s"hll_$c")).map(col)
    state.select(sel: _*).unionByName(delta.select(sel: _*))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The user-facing distinct counts: `nd_<col>` per sketch, sketches
    * dropped.
    */
  def finalizeDistinct(state: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(state)((df, c) =>
      df.withColumn(s"nd_$c", hll_sketch_estimate(col(s"hll_$c"))).drop(s"hll_$c"))

  // --------------------------------------- histogram state (percentiles)

  /** Mergeable PERCENTILE state: a fixed-width histogram per group —
    * (group, bin, cnt) rows with `bin = floor(m / width)`. Bin counts add
    * across batches (trivially mergeable, unlike order statistics), the
    * state is O(groups × occupied bins), and a quantile read costs one
    * cumulative walk over a group's bins. The readout error is bounded by
    * ONE BIN WIDTH (spec'd against the exact quantile operator) and every
    * step is integer/deterministic arithmetic — so unlike GK/KLL sketches
    * the folded state is exactly reproducible in plain SQL, hash-gate
    * included. Pick `width` from the domain (e.g. cents for money): the
    * accuracy/state trade is explicit, not buried in sketch internals.
    */
  def histState(batch: DataFrame, keys: Seq[String], measure: String,
      width: Double): DataFrame = {
    require(keys.nonEmpty && width > 0, "hist rollup needs keys and a positive width")
    batch.filter(col(measure).isNotNull)
      .groupBy((keys.map(col) :+ floor(col(measure) / width).cast("long").as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold histogram states: bin counts add. */
  def mergeHistState(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val sel = (keys :+ "bin" :+ "cnt").map(col)
    state.select(sel: _*).unionByName(delta.select(sel: _*))
      .groupBy((keys :+ "bin").map(col): _*).agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantiles from the folded histogram: for each requested probability,
    * the UPPER EDGE `(bin + 1) · width` of the first bin whose cumulative
    * count reaches `ceil(p · n)` — a deterministic upper bound on the
    * exact quantile, off by at most one bin width. One pass: a cumulative
    * window per group, then min over qualifying bins per probability.
    */
  def quantilesFromHist(state: DataFrame, keys: Seq[String], width: Double,
      probs: Seq[Double], names: Seq[String]): DataFrame = {
    require(probs.nonEmpty && probs.length == names.length,
      "need one output name per probability")
    require(probs.forall(p => p > 0 && p <= 1), s"probabilities must be in (0,1], got $probs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("bin"))
    val cum = state
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)))
    val aggs = probs.zip(names).map { case (p, name) =>
      min(when(col("cum") >= ceil(lit(p) * col("n")), (col("bin") + 1) * width)).as(name)
    }
    cum.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
