package graft

import org.apache.spark.sql.functions._
import graft.ops.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf: latest right row at-or-before each left time; nulls before first right row") {
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), "a"),
      (1L, ts("2026-01-01 12:00:00"), "b"),
      (1L, ts("2026-01-01 09:00:00"), "z"), // before any right row
      (2L, ts("2026-01-01 11:00:00"), "c")
    ).toDF("uid", "t", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100.0), // equal time → matches (inclusive)
      (1L, ts("2026-01-01 11:30:00"), 200.0),
      (2L, ts("2026-01-01 10:30:00"), 300.0)
    ).toDF("uid", "t", "price")

    val out = TemporalJoins.asOf(left, right, Seq("uid"), "t", "t", Seq("price"))
      .select("uid", "tag", "r_price").orderBy("uid", "tag")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, "a", Some(100.0)), // inclusive at equal ts
      (1L, "b", Some(200.0)),
      (1L, "z", None), // nothing before 09:00
      (2L, "c", Some(300.0))))
  }

  test("asOf: a matched right row's NULL value stays NULL (no stale fill); " +
    "multi-column values come from ONE right row") {
    val left = Seq((1L, ts("2026-01-01 12:00:00"), "x")).toDF("uid", "t", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 10:00:00"), Some(5.0), Some(10L)),
      // the as-of match: price NULL, qty present — the output must carry
      // THIS row's fields verbatim, never price=5.0 stitched from 10:00
      (1L, ts("2026-01-01 11:00:00"), None, Some(20L))
    ).toDF("uid", "t", "price", "qty")
    val out = TemporalJoins.asOf(left, right, Seq("uid"), "t", "t", Seq("price", "qty"))
      .select("uid", "r_price", "r_qty")
      .as[(Long, Option[Double], Option[Long])].collect().toSeq
    assert(out == Seq((1L, None, Some(20L))),
      s"expected the 11:00 row's fields atomically, got $out")
  }

  test("rangeJoin equals the naive interval join on fixtures") {
    val ev = Tables.events(spark, sfDir).select("event_id", "ts")
    val intervals = spark.range(1)
      .select(explode(sequence(
        to_timestamp(lit("2024-01-01")), to_timestamp(lit("2024-01-29")), expr("interval 7 days"))).as("w_start"))
      .withColumn("w_end", col("w_start") + expr("interval 14 days"))

    val naive = ev.join(intervals, col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "w_start")
    val bucketed = TemporalJoins.rangeJoin(ev, intervals, "ts", "w_start", "w_end")
      .select("event_id", "w_start")
    assert(bucketed.count() == naive.count())
    assert(bucketed.except(naive).count() == 0 && naive.except(bucketed).count() == 0)
  }
}
