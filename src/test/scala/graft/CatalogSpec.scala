package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.catalog.CatalogOps
import graft.functions.TextFunctions

class CatalogSpec extends SparkSpec {

  test("bucketed tables join and aggregate without any shuffle exchange") {
    CatalogOps.createDatabaseIfNotExists(spark, "graft_bkt")
    spark.sql("DROP TABLE IF EXISTS graft_bkt.li_b")
    spark.sql("DROP TABLE IF EXISTS graft_bkt.ord_b")
    CatalogOps.saveBucketed(Tables.lineitem(spark, sfDir), "graft_bkt.li_b", Seq("l_orderkey"), 4)
    CatalogOps.saveBucketed(
      Tables.orders(spark, sfDir).withColumnRenamed("o_orderkey", "l_orderkey"),
      "graft_bkt.ord_b", Seq("l_orderkey"), 4)

    val joined = spark.table("graft_bkt.li_b")
      .join(spark.table("graft_bkt.ord_b"), Seq("l_orderkey"))
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, s"expected shuffle-free plan, got:\n${joined.queryExecution.executedPlan}")
    // and it computes the same result as the unbucketed join
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    assert(joined.count() == plain.count())
  }

  test("langIdNgram: n-gram profile scoring on clear-cut samples") {
    import spark.implicits._
    val df = Seq(
      ("the weather and the end of the month", "en"),
      ("ich scheine nicht schlecht schreiben", "de"),
      ("", "und")
    ).toDF("text", "expected")
    val wrong = df.filter(TextFunctions.langIdNgram(spark, col("text")) =!= col("expected")).collect()
    assert(wrong.isEmpty, wrong.mkString(", "))
  }
}
