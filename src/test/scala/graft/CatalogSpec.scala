package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.catalog.CatalogOps
import graft.functions.TextFunctions

class CatalogSpec extends SparkSpec {

  // bucketed-join shuffle-freedom is asserted in BucketingSpec, which counts
  // Exchange nodes AFTER execution and inside AQE's QueryStageExec wrappers
  // (a collect on the unexecuted adaptive plan sees no exchanges and passes
  // vacuously — the trap the earlier version of this suite fell into)

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
