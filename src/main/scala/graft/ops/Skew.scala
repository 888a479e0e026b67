package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale (SURVEY.md §7 / the 100 TB design
  * rules): AQE's skew-join handling covers sort-merge joins at runtime, but
  * aggregation skew and broadcast-infeasible skewed joins still want explicit
  * salting. Both transforms here are exact — they re-derive the unsalted
  * result.
  */
object Skew {

  /** The columns of `df` that xxhash64 accepts: hashing a MapType (or a
    * type nesting one) throws AnalysisException — map entry order is
    * undefined, so Spark refuses to hash it. Salting only needs SOME
    * deterministic per-row variation; dropping unhashable columns from the
    * salt input keeps any-schema frames accepted (the pre-r19 `rand(seed)`
    * salt took any schema; the deterministic salt must too). A frame whose
    * EVERY column is a map degenerates to one salt bucket — still exact,
    * just unspread; any hashable column restores the spread.
    */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    df.schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name)).toIndexedSeq
  }

  /** Two-stage salted aggregation: stage 1 aggregates on (keys, salt) —
    * spreading a hot key over `saltBuckets` reducers — stage 2 merges the
    * partials on the true keys. Exact for algebraic aggregates (sum/count/
    * min/max). The salt is a DETERMINISTIC per-row hash of the whole row
    * (+ seed), NOT `rand(seed)`: rand is not stable under partial-stage
    * recompute, so a fetch-failure retry could re-salt re-run map output
    * into different reduce partitions and double-count or drop partials —
    * the SPARK-23207 class of bug, fatal for an EXACT aggregate. The one
    * trade: fully-identical duplicate rows share a salt (they cannot be
    * told apart), so a hot key made of literal row copies spreads less —
    * any column that varies restores the spread.
    */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltBuckets: Int = 16,
      seed: Long = 42L): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(hashableCols(df) :+ lit(seed): _*), lit(saltBuckets.toLong)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed left side against a modest right side that
    * exceeds the broadcast threshold: left rows get a deterministic
    * per-row hash salt in
    * [0, saltBuckets); the right side is replicated once per salt value; the
    * join key becomes (key, salt). Each left row matches exactly the one
    * replica carrying its salt → result rows identical to the plain join.
    * Right-side volume multiplies by `saltBuckets` — size accordingly.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int = 8,
      joinType: String = "inner",
      seed: Long = 42L): DataFrame = {
    // Right/full outer would emit each unmatched right row once PER REPLICA
    // (saltBuckets null-extended rows) — not the plain-join result, so reject.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti")
        .contains(normalized),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti joins, not '$joinType' " +
        "(right/full outer would duplicate unmatched right rows once per salt replica)")
    // deterministic per-row salt (see saltedSum): rand(seed) re-salts
    // re-run map tasks differently under a fetch-failure retry, which
    // would route a left row to a replica that no longer matches it
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(hashableCols(left) :+ lit(seed): _*), lit(saltBuckets.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Diagnostic: per-key row counts with their share of the total — find the
    * keys that need salting before they find you.
    *
    * Single input scan: the per-key counts are persisted (they are the
    * aggregated, small side) and the grand total is re-derived from them, so
    * `df` is never read twice; the top-N result is materialized eagerly and
    * the cache released before returning — no pinned blocks outlive the
    * call.
    */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n")).persist()
    val total = counts.agg(sum(col("n")).cast("double").as("__total"))
    val out = counts
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("__total"), 6))
      .drop("__total")
      .orderBy(col("n").desc)
      .limit(topN)
    graft.util.Caching.materialize(out, counts)
  }
}
