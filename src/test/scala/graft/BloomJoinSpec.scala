package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomJoin

/** The bloom pre-filter is a pure optimization: the semi-join result must
  * equal the plain semi-join exactly, at any fpp.
  */
class BloomJoinSpec extends SparkSpec {

  test("bloomSemiJoin equals the plain left-semi join exactly") {
    val li = Tables.lineitem(spark, sfDir)
    val picked = Tables.supplier(spark, sfDir).filter(col("s_acctbal") > 5000)
    val bloomed = BloomJoin.bloomSemiJoin(li, picked, "l_suppkey", "s_suppkey",
      expectedKeys = Some(1000L), fpp = 0.05)
    // using-column semi join moves the key first — realign for exceptAll's
    // positional compare
    val plain = li.join(picked.select(col("s_suppkey").as("l_suppkey")).distinct(),
      Seq("l_suppkey"), "left_semi")
      .select(bloomed.columns.map(col): _*)
    assert(bloomed.count() == plain.count())
    assert(bloomed.exceptAll(plain).count() == 0 && plain.exceptAll(bloomed).count() == 0)
    assert(plain.count() > 0, "fixture subset should be non-empty")
  }

  test("auto-sized bloom (expectedKeys = None) equals the explicitly-sized join") {
    // (no getPersistentRDDs leak assertion here: the shared test session
    // carries other suites' in-flight checkpoint blocks, so a global
    // emptiness check is inherently racy — the auto path's unpersist is in
    // a finally right next to the persist in BloomJoin)
    val li = Tables.lineitem(spark, sfDir)
    val picked = Tables.supplier(spark, sfDir).filter(col("s_acctbal") > 5000)
    val auto = BloomJoin.bloomSemiJoin(li, picked, "l_suppkey", "s_suppkey")
    val sized = BloomJoin.bloomSemiJoin(li, picked, "l_suppkey", "s_suppkey",
      expectedKeys = Some(1000L))
    assert(auto.exceptAll(sized).count() == 0 && sized.exceptAll(auto).count() == 0)
  }

  test("bloomSemiJoin with an empty key side returns no rows") {
    val li = Tables.lineitem(spark, sfDir)
    val none = Tables.supplier(spark, sfDir).filter(lit(false))
    assert(BloomJoin.bloomSemiJoin(li, none, "l_suppkey", "s_suppkey").count() == 0)
  }

  test("bloomSemiJoin works on STRING keys (bloom over xxhash64, not a bigint cast)") {
    import spark.implicits._
    val fact = Seq(("S001", 1), ("S002", 2), ("S003", 3), ("S001", 4)).toDF("code", "v")
    val keys = Seq("S001", "S003").toDF("k")
    val out = BloomJoin.bloomSemiJoin(fact, keys, "code", "k", expectedKeys = Some(10L))
    assert(out.count() == 3)
    assert(out.select("code").distinct().orderBy("code").collect().map(_.getString(0)).toSeq
      == Seq("S001", "S003"))
  }
}
