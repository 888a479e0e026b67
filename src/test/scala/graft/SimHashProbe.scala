package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic main (not a spec): exhaustive cosine truth vs SimHash
  * hamming at BOTH gate scale (sf0.01, the q41 oracle corpus) and bench
  * scale (sf0.1), to pick the candidate hamming cut with a measured safety
  * margin. Run: sbt "Test/runMain graft.SimHashProbe"
  */
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", false)
      .appName("simhash-probe").getOrCreate()
    graft.extensions.GraftExtensions.register(spark)

    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val d = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val docs = d.union(d.select(col("doc_id") + 1000000, concat(col("text"), lit(" zz"))))

      val docvec = docs
        .select(col("doc_id").as("id"),
          explode(graft.extensions.GraftExtensions.ws_tokens(lower(col("text")))).as("tok"))
        .groupBy(col("id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy("id").agg(
          sort_array(collect_list(struct(xxhash64(col("tok")).as("th"), col("c")))).as("vec"),
          sum(col("c")).as("nt"),
          sqrt(sum(col("c") * col("c")).cast("double")).as("nrm"))
        .filter(col("nt") >= 50)
        .select(col("id"), col("vec"), col("nrm"),
          graft.extensions.GraftExtensions.simhash64(col("vec")).as("sig"))
        .persist()
      val n = docvec.count()
      println(s"== [$sf] eligible docs: $n")

      // EXHAUSTIVE all-pairs truth: every cos >= 0.93 pair and its hamming
      val a = docvec.select(col("id").as("id_a"), col("vec").as("va"),
        col("nrm").as("na"), col("sig").as("sa"))
      val b = docvec.select(col("id").as("id_b"), col("vec").as("vb"),
        col("nrm").as("nb"), col("sig").as("sb"))
      val truth = a.join(broadcast(b), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (graft.extensions.GraftExtensions.sparse_dot(col("va"), col("vb")).cast("double") /
            (col("na") * col("nb"))).as("cos"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).as("ham"))
        .filter(col("cos") >= 0.93)
        .persist()
      println(s"== [$sf] pairs with cos >= 0.93: ${truth.count()}")
      println(s"== [$sf] TRUE pairs (cos >= 0.95) by hamming:")
      truth.filter(col("cos") >= 0.95).groupBy("ham").agg(count(lit(1)).as("n"),
        min("cos").as("min_cos"), max("cos").as("max_cos")).orderBy("ham").show(30, false)
      println(s"== [$sf] NEAR-threshold pairs (0.93 <= cos < 0.95) by hamming:")
      truth.filter(col("cos") < 0.95).groupBy("ham").agg(count(lit(1)).as("n"),
        max("cos").as("max_cos")).orderBy("ham").show(30, false)
      val mx = truth.filter(col("cos") >= 0.95).agg(max("ham")).collect()(0).getInt(0)
      println(s"== [$sf] MAX true-pair hamming: $mx")
      truth.unpersist(); docvec.unpersist()
    }
    spark.stop()
  }
}
