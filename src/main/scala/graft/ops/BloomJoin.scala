package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pre-filtered joins: the standard way to join a huge fact table
  * against a selective dimension subset at 100 TB.
  *
  * A plain (even broadcast) join still SHUFFLES or hash-probes every fact
  * row that will later be dropped. Building a bloom filter of the key side
  * (one `bloom_filter_agg` pass → a single binary scalar, broadcast as a
  * 1-row frame — the same mechanism as Spark's own injected runtime
  * filters) and filtering with `might_contain` BEFORE the join eliminates
  * the non-matching bulk in the scan stage; the exact join then only sees
  * true matches plus the bloom's false-positive sliver, which it removes.
  * Semantics are therefore EXACTLY the plain join's (false positives never
  * survive, false negatives don't exist) — which is what makes the
  * operator oracle-checkable row-for-row.
  */
object BloomJoin {

  /** Left-semi join `fact ⋉ keys` with a bloom pre-filter on the fact side.
    *
    * @param expectedKeys sizing for the bloom (expected distinct keys)
    * @param fpp          target false-positive rate: the pre-filter passes
    *                     ~fpp of non-matching fact rows to the exact join
    */
  def bloomSemiJoin(
      fact: DataFrame,
      keys: DataFrame,
      factKey: String,
      keysKey: String,
      expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    graft.extensions.GraftExtensions.register(spark)
    val numBits = math.max(64L,
      (-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // might_contain requires its bloom input to be a constant or a SCALAR
    // SUBQUERY (the form Spark's own InjectRuntimeFilter emits) — the
    // subquery runs once, its binary result ships with the filter to the
    // fact scan stage; the IN-subquery is the exact semi join that removes
    // bloom false positives.
    fact.createOrReplaceTempView("__graft_bloom_fact")
    keys.createOrReplaceTempView("__graft_bloom_keys")
    spark.sql(
      s"""SELECT f.* FROM __graft_bloom_fact f
         |WHERE might_contain(
         |    (SELECT bloom_filter_agg(cast($keysKey AS BIGINT), ${expectedKeys}L, ${numBits}L)
         |     FROM __graft_bloom_keys),
         |    cast(f.$factKey AS BIGINT))
         |  AND f.$factKey IN (SELECT $keysKey FROM __graft_bloom_keys)""".stripMargin)
  }
}
