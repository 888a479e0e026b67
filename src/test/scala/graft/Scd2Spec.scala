package graft

import org.apache.spark.sql.functions._
import graft.ingest.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: Seq[(Long, String, String, Option[String])]) =
    rows.toDF("k", "v", "valid_from", "valid_to")
      .select(col("k"), col("v"),
        to_date(col("valid_from")).as("valid_from"),
        to_date(col("valid_to")).as("valid_to"))

  test("applyScd2: change closes+opens, no-op untouched, fresh key opens; re-apply is a no-op") {
    val target = hist(Seq(
      (1L, "a", "2020-01-01", Some("2021-01-01")), // closed history — must pass through
      (1L, "b", "2021-01-01", None),               // open, batch changes it
      (2L, "x", "2020-01-01", None),               // open, batch re-sends same value
      (3L, "y", "2020-01-01", None)))              // open, absent from batch
    val batch = Seq((1L, "c"), (2L, "x"), (9L, "z")).toDF("k", "v")

    val applied = Scd2.applyScd2(target, batch, Seq("k"), Seq("v"), lit("2024-06-01"))
    val expected = hist(Seq(
      (1L, "a", "2020-01-01", Some("2021-01-01")),
      (1L, "b", "2021-01-01", Some("2024-06-01")), // closed at effective
      (1L, "c", "2024-06-01", None),               // new version opened
      (2L, "x", "2020-01-01", None),               // no-op: history untouched
      (3L, "y", "2020-01-01", None),               // untouched
      (9L, "z", "2024-06-01", None)))              // fresh key opens
    assert(applied.exceptAll(expected).isEmpty && expected.exceptAll(applied).isEmpty,
      applied.orderBy("k", "valid_from").collect().mkString("\n"))

    // idempotence: the same batch against the new history changes nothing
    val again = Scd2.applyScd2(applied, batch, Seq("k"), Seq("v"), lit("2024-07-01"))
    assert(again.exceptAll(applied).isEmpty && applied.exceptAll(again).isEmpty,
      again.orderBy("k", "valid_from").collect().mkString("\n"))
  }

  test("applyScd2 is null-safe in value comparison: NULL -> NULL is a no-op, NULL -> value a change") {
    val target = hist(Seq((1L, null, "2020-01-01", None), (2L, null, "2020-01-01", None)))
    val batch = Seq((1L, Option.empty[String]), (2L, Some("now-set"))).toDF("k", "v")
    val applied = Scd2.applyScd2(target, batch, Seq("k"), Seq("v"), lit("2024-06-01"))
    val expected = hist(Seq(
      (1L, null, "2020-01-01", None),               // NULL == NULL: untouched
      (2L, null, "2020-01-01", Some("2024-06-01")), // NULL -> value: closed
      (2L, "now-set", "2024-06-01", None)))
    assert(applied.exceptAll(expected).isEmpty && expected.exceptAll(applied).isEmpty,
      applied.orderBy("k", "valid_from").collect().mkString("\n"))
  }
}
