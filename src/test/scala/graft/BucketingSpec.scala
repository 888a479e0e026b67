package graft

import org.apache.spark.sql.functions._
import graft.catalog.CatalogOps

/** Bucketed layout: pre-shuffle a table ONCE at write time
  * ([[CatalogOps.saveBucketed]]) so every later equi-join or aggregation on
  * the bucket key runs with ZERO Exchange nodes — asserted here against an
  * unbucketed control, counting exchanges post-execution and inside AQE's
  * query-stage wrappers. At 100 TB the shuffle is the join's dominant cost;
  * same-bucketed tables are co-located by construction.
  */
class BucketingSpec extends SparkSpec {

  /** Every node of the executed plan INCLUDING the subtrees AQE hides
    * inside QueryStageExec leaf wrappers (a plain `.collect` stops at the
    * wrapper and sees zero exchanges no matter what actually ran).
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val nested = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => allNodes(r.child)
      case _ => Seq.empty
    }
    (p +: p.children.flatMap(allNodes)) ++ nested
  }

  private def exchangeCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
  }

  test("same-bucket join runs with ZERO exchanges and matches the plain join") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    CatalogOps.saveBucketed(orders, "b_orders", Seq("o_custkey"), 8)
    CatalogOps.saveBucketed(customer, "b_customer", Seq("o_custkey"), 8)
    try {
      // broadcast would trivially avoid the shuffle — force the shuffle-join
      // path (static AND adaptive thresholds) so the assertion is about
      // BUCKETING, then count Exchange nodes of any kind
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val aqeThreshold = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        val bucketed = spark.table("b_orders").join(spark.table("b_customer"), Seq("o_custkey"))
        assert(exchangeCount(bucketed) == 0,
          s"bucketed join still exchanges:\n${bucketed.queryExecution.executedPlan}")
        val plain = orders.join(customer, Seq("o_custkey"))
        assert(exchangeCount(plain) > 0, "control: the unbucketed join should shuffle")
        assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        aqeThreshold match {
          case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
          case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("groupBy on the bucket key also needs no exchange") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    CatalogOps.saveBucketed(orders, "b_orders_agg", Seq("o_custkey"), 8)
    try {
      val agg = spark.table("b_orders_agg").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      assert(exchangeCount(agg) == 0,
        s"bucketed aggregation still shuffles:\n${agg.queryExecution.executedPlan}")
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
