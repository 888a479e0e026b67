package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.TopK

/** The custom TopKPerKey operator must produce EXACTLY the window
  * formulation's rows (row_number <= k under the same total order) and
  * plan as partial-heaps → hash exchange on keys → final-heaps.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Evaluate `f` with RowNumberTopKRewrite disabled — the window
    * formulation is this suite's REFERENCE, so it must not itself be
    * rewritten into the operator under test (another suite may have
    * registered the rule on the shared session).
    */
  private def withoutRewrite[T](f: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == graft.plans.RowNumberTopKRewrite)
    try f finally spark.experimental.extraOptimizations = saved
  }

  test("topKPerKey equals the window row_number formulation exactly") {
    for (k <- Seq(1, 3, 10)) {
      val custom = TopK.topKPerKey(Tables.orders(spark, sfDir),
        keys = Seq("o_orderpriority"),
        order = Seq(("o_totalprice", false), ("o_orderkey", true)), k = k)
        .orderBy("o_orderkey").collect().toSeq
      val ref = withoutRewrite(windowTopK(k).orderBy("o_orderkey").collect().toSeq)
      assert(custom == ref, s"k=$k")
    }
  }

  test("RowNumberTopKRewrite: plain window syntax plans as the bounded-heap operator") {
    graft.extensions.GraftExtensions.register(spark)
    val df = windowTopK(3) // filter rn<=3 then drop rn — rewrite-eligible
    val got = df.orderBy("o_orderkey").collect().toSeq
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size >= 2, plan)
    // neither the window exec nor Spark's own sort-based WindowGroupLimit
    // (which InferWindowGroupLimit inserts for this shape) may survive —
    // the heaps subsume both, with no Sort at all
    assert(!plan.contains("Window [") && !plan.contains("WindowGroupLimit") &&
      !plan.contains("Sort "), plan)
    withoutRewrite {
      val ref = windowTopK(3)
      val want = ref.orderBy("o_orderkey").collect().toSeq
      assert(ref.queryExecution.executedPlan.toString.contains("Window"),
        "control must remain a genuine window plan")
      assert(got == want)
    }
    // keeping the rank column in the output must BLOCK the rewrite
    val keeps = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
    keeps.collect()
    assert(keeps.queryExecution.executedPlan.toString.contains("Window"),
      "rank-observing query must not be rewritten")
  }

  test("topKPerKey plans as partial/final heap pair around one hash exchange, no sort") {
    val df = TopK.topKPerKey(Tables.orders(spark, sfDir),
      keys = Seq("o_orderpriority"), order = Seq(("o_totalprice", false), ("o_orderkey", true)), k = 2)
    df.collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size >= 2, plan) // physical node renders without 'Exec'
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("SortExec") && !plan.contains("Window"), plan)
  }

  test("topKPerKey handles more keys than k, empty input, and k >= group size") {
    val tiny = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0))
      .toDF("g", "id", "v")
    val out = TopK.topKPerKey(tiny, Seq("g"), Seq(("v", false), ("id", true)), k = 5)
    assert(out.count() == 3) // k larger than any group: everything survives
    val empty = TopK.topKPerKey(tiny.filter(lit(false)), Seq("g"), Seq(("v", false)), k = 2)
    assert(empty.count() == 0)
    assertThrows[IllegalArgumentException](
      TopK.topKPerKey(tiny, Seq("nope"), Seq(("v", false)), k = 1))
  }
}
