package graft

import org.apache.spark.sql.functions._
import graft.ingest.IncrementalRollup

/** The incrementally-maintained rollup: folding batches through mergeable
  * state must equal one full aggregation, in ANY fold order (the state is a
  * commutative monoid), including groups that appear in only one batch and
  * NULL measure values.
  */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")
  private val ms = Seq("v")

  test("fold of batches equals full aggregation, independent of fold order") {
    val batches = Seq(
      Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", Some(10.0))),
      Seq(("a", Some(5.0)), ("c", Some(-2.0)), ("c", None)), // NULL measure: counted out
      Seq(("b", Some(0.5))))
      .map(_.toDF("g", "v"))
    val full = IncrementalRollup.finalize(
      IncrementalRollup.aggState(batches.reduce(_ unionByName _), keys, ms), ms)
      .orderBy("g").collect().toSeq
    for (perm <- batches.permutations) {
      val folded = IncrementalRollup.finalize(
        perm.map(b => IncrementalRollup.aggState(b, keys, ms))
          .reduce((a, b) => IncrementalRollup.mergeState(a, b, keys, ms)), ms)
        .orderBy("g").collect().toSeq
      assert(folded == full, s"fold order changed the rollup: $folded vs $full")
    }
  }

  test("state stays O(groups): folding a batch never scans prior facts") {
    // structural: mergeState's plan reads ONLY the two state frames — no
    // scan of any fact table can appear in it
    val s1 = IncrementalRollup.aggState(Seq(("a", 1.0)).toDF("g", "v"), keys, ms)
    val s2 = IncrementalRollup.aggState(Seq(("a", 2.0)).toDF("g", "v"), keys, ms)
    val merged = IncrementalRollup.mergeState(s1, s2, keys, ms)
    val row = merged.collect().head
    assert(row.getDouble(1) == 3.0 && row.getLong(2) == 2L
      && row.getDouble(3) == 1.0 && row.getDouble(4) == 2.0)
    // an all-NULL-measure group carries cnt 0 and NULL min/max/avg, like SQL
    val s3 = IncrementalRollup.aggState(Seq(("z", Option.empty[Double])).toDF("g", "v"), keys, ms)
    val fin = IncrementalRollup.finalize(
      IncrementalRollup.mergeState(s1, s3, keys, ms), ms).orderBy("g").collect()
    assert(fin(1).getLong(2) == 0L && fin(1).isNullAt(3) && fin(1).isNullAt(5),
      s"all-NULL group must finalize to NULLs: ${fin(1)}")
  }

  test("incremental join view: random delta folds equal the one-shot join") {
    import graft.ingest.IncrementalJoin
    val rnd = new scala.util.Random(53L)
    for (round <- 0 until 5) {
      val aRows = (0 until 30 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(15).toLong, rnd.nextInt(100)))
      val bRows = (0 until 30 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(15).toLong, rnd.nextInt(100)))
      val nLoads = 2 + rnd.nextInt(3)
      // random, possibly EMPTY delta slices per load (empty deltas exercise
      // the degenerate terms of the delta rule)
      val aSplit = aRows.map(r => (rnd.nextInt(nLoads), r))
      val bSplit = bRows.map(r => (rnd.nextInt(nLoads), r))
      val loads = (0 until nLoads).map { i =>
        (aSplit.filter(_._1 == i).map(_._2).toDF("k", "av"),
          bSplit.filter(_._1 == i).map(_._2).toDF("k", "bv"))
      }
      val (view, fa, fb) = IncrementalJoin.foldView(loads, Seq("k"))
      val oneShot = aRows.toDF("k", "av").join(bRows.toDF("k", "bv"), Seq("k"))
      assert(view.exceptAll(oneShot).count() == 0 && oneShot.exceptAll(view).count() == 0,
        s"round $round: folded view diverged from the one-shot join")
      // the folded sides are the full sides
      assert(fa.count() == aRows.length.toLong && fb.count() == bRows.length.toLong)
    }
  }
}
