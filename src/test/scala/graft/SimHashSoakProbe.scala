package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic main (not a spec): decompose the SimHash soak's x4
  * superlinearity. Two questions the r8 verdict left open:
  *
  *  1. Is the 5.4× candidate growth SCHEME-induced (probe collisions) or
  *     INTRINSIC (the hamming<=9 band of the scaled corpus itself growing
  *     superlinearly because each replica is an independent signature
  *     realization)? Answer: exhaustive sig-only band count at x1/x4,
  *     split per replica.
  *  2. Where does the 11.6s x4 wall-clock go — tokenize/agg, candidate
  *     join, or verify? Answer: phase-by-phase timing.
  *
  * Run: sbt "Test/runMain graft.SimHashSoakProbe"
  */
object SimHashSoakProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", false)
      .appName("simhash-soak-probe").getOrCreate()
    import spark.implicits._
    graft.extensions.GraftExtensions.register(spark)
    val sf01 = "/root/testdata/sf0.1"
    val soakRoot = java.nio.file.Files.createTempDirectory("graft-probe").toString

    def scaledDocs(factor: Int): DataFrame = {
      val path = s"$soakRoot/docs_x$factor"
      if (!new java.io.File(path).exists()) {
        val base = Tables.documents(spark, sf01).select(col("doc_id"), col("text"))
        val reps = (0 until factor).map { i =>
          if (i == 0) base
          else base.as[(Long, String)].map { case (id, text) =>
            (id + i * 10000000L, text.split(' ').map(t => s"$t~$i").mkString(" "))
          }.toDF("doc_id", "text")
        }
        val all = reps.reduce(_ unionByName _)
        all.unionByName(all.select((col("doc_id") + 500000000L).as("doc_id"),
          concat(col("text"), lit(" zz")).as("text")))
          .repartition(32).write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }

    def docvecOf(docs: DataFrame): DataFrame = docs
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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== TIME [$label] ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    // ---- 1. intrinsic hamming<=9 band, exhaustive over signatures only
    for (factor <- Seq(1, 4)) {
      val sigs = docvecOf(scaledDocs(factor)).select(col("id"), col("sig")).persist()
      val n = sigs.count()
      println(s"== [x$factor] eligible docs: $n")
      val b = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
      val band = time(s"x$factor exhaustive band") {
        sigs.join(broadcast(b), col("id") < col("id_b"))
          .filter(bit_count(col("sig").bitwiseXOR(col("sig_b"))) <= 9)
          .select(((col("id") % 500000000L) / 10000000L).cast("int").as("rep_a"),
            ((col("id_b") % 500000000L) / 10000000L).cast("int").as("rep_b"))
          .groupBy("rep_a", "rep_b").agg(count(lit(1)).as("n"))
          .orderBy("rep_a", "rep_b")
          .collect()
      }
      val total = band.map(_.getLong(2)).sum
      println(s"== [x$factor] intrinsic hamming<=9 band TOTAL: $total")
      band.foreach(r => println(s"==   rep ${r.getInt(0)}x${r.getInt(1)}: ${r.getLong(2)}"))
      sigs.unpersist()
    }

    // ---- 2. phase timing at x1 and x4
    for (factor <- Seq(1, 4)) {
      println(s"== PHASES [x$factor]")
      val docs = scaledDocs(factor)
      // warm-up full pipeline once
      if (factor == 1) noop(graft.dedup.Dedup.simHashCosineNearDups(docs))
      val dv = docvecOf(docs).persist()
      time(s"x$factor phase1 docvec build+persist") { dv.count() }
      // OLD candidate stage (r8 symmetric radius-1, multiplicity ~49)
      val sigs = dv.select(col("id"), col("sig"))
      val chunks = 4; val width = 16; val mask = (1L << width) - 1; val pw = width + 1
      val probed = sigs
        .select(col("id"), col("sig"), explode(sequence(lit(0), lit(chunks * pw - 1))).as("pi"))
        .select(col("id"), col("sig"),
          expr(s"CAST(pi DIV $pw AS INT)").as("chunk"),
          expr(s"pi % $pw").as("pr"))
        .select(col("id"), col("sig"), col("chunk"),
          expr(s"CASE WHEN pr = 0 THEN shiftrightunsigned(sig, chunk * $width) & ${mask}L " +
            s"ELSE (shiftrightunsigned(sig, chunk * $width) & ${mask}L) ^ shiftleft(1L, CAST(pr - 1 AS INT)) END")
            .as("pval"))
      val oldPairs = probed
        .join(broadcast(probed.select(col("id").as("id_b"), col("sig").as("sig_b"),
          col("chunk"), col("pval"))), Seq("chunk", "pval"))
        .filter(col("id") < col("id_b") &&
          bit_count(col("sig").bitwiseXOR(col("sig_b"))) <= 9)
        .select(col("id").as("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
      for (rep <- 1 to 2) {
        val ncOld = time(s"x$factor OLD candidates rep$rep") { oldPairs.count() }
        println(s"==   [x$factor] OLD candidates: $ncOld")
      }
      // NEW candidate stage (r9 asymmetric raw-vs-radius-2)
      val rawSide = sigs
        .select(col("id"), col("sig"), explode(sequence(lit(0), lit(chunks - 1))).as("chunk"))
        .select(col("id"), col("sig"), col("chunk").cast("int").as("chunk"),
          expr(s"shiftrightunsigned(sig, chunk * $width) & ${mask}L").as("pval"))
      val flipMasks: Array[Long] = {
        val singles = (0 until width).map(i => 1L << i)
        val doubles = for (i <- 0 until width; j <- i + 1 until width) yield (1L << i) | (1L << j)
        (0L +: (singles ++ doubles)).toArray
      }
      val nProbes = flipMasks.length
      val probeSide = sigs
        .select(col("id").as("id_b"), col("sig").as("sig_b"),
          explode(sequence(lit(0), lit(chunks * nProbes - 1))).as("pi"))
        .select(col("id_b"), col("sig_b"),
          expr(s"CAST(pi DIV $nProbes AS INT)").as("chunk"),
          expr(s"CAST(pi % $nProbes AS INT)").as("pr"))
        .select(col("id_b"), col("sig_b"), col("chunk"),
          expr(s"shiftrightunsigned(sig_b, chunk * $width) & ${mask}L")
            .bitwiseXOR(element_at(lit(flipMasks), col("pr") + 1)).as("pval"))
      val newPairs = probeSide
        .join(broadcast(rawSide), Seq("chunk", "pval"))
        .filter(col("id") < col("id_b") &&
          bit_count(col("sig").bitwiseXOR(col("sig_b"))) <= 9)
        .select(col("id").as("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
      for (rep <- 1 to 2) {
        val ncNew = time(s"x$factor NEW candidates rep$rep") { newPairs.count() }
        println(s"==   [x$factor] NEW candidates: $ncNew")
      }
      for (rep <- 1 to 2)
        time(s"x$factor FULL pipeline (as shipped) rep$rep") {
          noop(graft.dedup.Dedup.simHashCosineNearDups(docs))
        }
      dv.unpersist()
    }
    spark.stop()
  }
}
