package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.multimodal.Multimodal

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("embeddingNearDups finds perturbed twins and no random pairs") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 50)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val pert = base.select((col("id") + 1000).as("id"),
      transform(col("vec"), (x, i) => when(i === 0, x + 0.01).otherwise(x)).as("vec"))
    val pairs = Dedup.embeddingNearDups(base.union(pert), threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (0L until 50L).map(i => (i, i + 1000)).toSet
    assert(pairs == expected, s"missing=${expected.diff(pairs).size} extra=${pairs.diff(expected).size}")
  }

  test("exportReportData writes the three notebook chart feeds as readable headered CSVs") {
    val out = java.nio.file.Files.createTempDirectory("graft-reports").toString
    graft.analytics.Analytics.exportReportData(spark, sfDir, out)
    for (name <- Seq("top_campaigns_by_spend", "daily_ctr_trend", "creative_scorecard")) {
      val back = spark.read.option("header", "true").csv(s"$out/$name")
      assert(back.count() > 0, s"$name is empty")
      assert(back.columns.length >= 2, s"$name lost its columns: ${back.columns.mkString(",")}")
    }
    // the trend feed matches the query it claims to export
    val trend = spark.read.option("header", "true").csv(s"$out/daily_ctr_trend")
    assert(trend.count() == graft.analytics.Analytics.dailyCtrTrend(spark, sfDir).count())
  }

  test("bpeTokens splits contractions, words, digits, punctuation") {
    val toks = Seq("It's 42 degrees, really!").toDF("text")
      .select(TextFunctions.bpeTokens(col("text"))).as[Seq[String]].head()
    assert(toks == Seq("It", "'s", " 42", " degrees", ",", " really", "!"), toks.toString)
  }

  test("resizeStub downsamples bytes deterministically") {
    val media = Multimodal.asMedia(
      Seq((1L, "abcdefghij")).toDF("id", "payload"), "id", "payload", "image/fake")
    val out = Multimodal.resizeStub(media, factor = 4).select("media").as[Array[Byte]].head()
    assert(new String(out, "UTF-8") == "aei")
  }
}
