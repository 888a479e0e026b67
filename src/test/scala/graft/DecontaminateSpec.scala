package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Decontaminate, Dedup}
import graft.functions.TextFunctions

/** Benchmark decontamination (q152): the bloom-pre-filtered overlap sweep
  * must produce EXACTLY the plain-join truth — the bloom only discards, the
  * exact semi join removes its false-positive sliver.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"), // shares the 4-gram with 2
    (2L, "alpha beta gamma delta other tail words"),
    (3L, "completely disjoint text with no overlap at all"),
    (4L, "short doc"), // under n tokens: no n-grams, never flagged
    (5L, "alpha beta gamma delta epsilon zeta") // exact dup of 1
  ).toDF("doc_id", "text")

  // benchmark = doc 2's text (so docs 1, 2, 5 share "alpha beta gamma delta")
  private val bench = corpus.filter($"doc_id" === 2).select($"text")

  test("flags equal the plain-join truth (bloom sliver removed)") {
    val got = Decontaminate.ngramOverlap(corpus, bench, n = 4, minHits = 1)
      .orderBy($"doc_id")
    // plain-join truth at the same shingle length, no bloom anywhere
    val sh = (df: org.apache.spark.sql.DataFrame) => df.select($"doc_id",
      explode(TextFunctions.shingleHashes(spark, $"text", 4)).as("h"))
    val truth = corpus.select($"doc_id")
      .join(
        sh(corpus).join(sh(bench.withColumn("doc_id", lit(0L))).select($"h").distinct(), "h")
          .groupBy($"doc_id").agg(count(lit(1)).as("n_hit")),
        Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"n_hit", lit(0L)).as("n_hit"),
        (coalesce($"n_hit", lit(0L)) >= 1).as("contaminated"))
      .orderBy($"doc_id")
    assert(got.collect().toSeq == truth.collect().toSeq)
    val byId = got.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(byId(1L)._2 && byId(2L)._2 && byId(5L)._2)
    assert(!byId(3L)._2 && byId(3L)._1 == 0L)
  }

  test("a doc under n tokens has no n-grams and is never flagged") {
    val byId = Decontaminate.ngramOverlap(corpus, bench, n = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!byId(4L))
    // even when the benchmark CONTAINS the short doc verbatim
    val byId2 = Decontaminate
      .ngramOverlap(corpus, corpus.filter($"doc_id" === 4).select($"text"), n = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(byId2.values.forall(_ == false))
  }

  test("minHits is a threshold on DISTINCT shared n-grams") {
    // doc 2 shares 1 distinct 4-gram with doc 1's text; doc 5 shares all 3
    val flags = Decontaminate
      .ngramOverlap(corpus, corpus.filter($"doc_id" === 1).select($"text"),
        n = 4, minHits = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(flags(2L) == ((1L, false))) // one shared gram < minHits 2
    assert(flags(5L)._1 == 3L && flags(5L)._2)
    assert(flags(1L)._2)
  }

  test("removeContaminated keeps all columns and exactly the clean docs") {
    val withExtra = corpus.withColumn("lang", lit("en"))
    val clean = Decontaminate.removeContaminated(withExtra, bench, n = 4)
    assert(clean.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(clean.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("the corpus-side plan carries the bloom pre-filter (scan-stage discard)") {
    val plan = Decontaminate.ngramOverlap(corpus, bench, n = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom pre-filter in plan:\n$plan")
  }

  test("empty benchmark: nothing flagged, removeContaminated is identity") {
    val emptyBench = bench.filter(lit(false))
    val flags = Decontaminate.ngramOverlap(corpus, emptyBench, n = 4)
    assert(flags.filter($"contaminated").count() == 0)
    assert(flags.count() == corpus.count())
    assert(Decontaminate.removeContaminated(corpus, emptyBench, n = 4).count() == corpus.count())
  }

  test("exciseContaminated cuts exactly the matching window, reassembles in order") {
    val d = Seq(
      (1L, "a b c d e"),   // hit at p=1 covers tokens 1..3 → "a e"
      (2L, "x y z w v"),   // clean
      (3L, "a b c d e f")  // hit at p=1 covers 1..3 → "a e f"
    ).toDF("doc_id", "text")
    val bench = Seq("b c d").toDF("text")
    val out = Decontaminate.exciseContaminated(d, bench, n = 3).orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a e", 5L, 3L),
      (2L, "x y z w v", 5L, 0L),
      (3L, "a e f", 6L, 3L)))
  }

  test("exciseContaminated: overlapping hit windows merge (a token is cut once)") {
    val d = Seq((3L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq("a b c", "c d e").toDF("text") // hits p=0 (0..2) and p=2 (2..4)
    val out = Decontaminate.exciseContaminated(d, bench, n = 3)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((3L, "f", 6L, 5L)))
  }

  test("exciseContaminated: benchmark-member doc excises to empty; short docs untouched") {
    val d = Seq(
      (1L, "p q r s t u"),
      (2L, "a b"),             // under n tokens: no windows, untouched
      (3L, "Mixed CASE Tokens Here Output Lowercases")
    ).toDF("doc_id", "text")
    val bench = d.filter($"doc_id" === 1).select($"text")
    val out = Decontaminate.exciseContaminated(d, bench, n = 3).orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out(0) == ((1L, "", 6L, 6L)))
    assert(out(1) == ((2L, "a b", 2L, 0L)))
    assert(out(2) == ((3L, "mixed case tokens here output lowercases", 6L, 0L)))
  }

  test("exciseContaminated: a long ~fully-contaminated doc is interval-bounded, not O(len^2)") {
    // one 30k-token doc quoting the benchmark end-to-end: every window
    // hits, so positions x hits would be ~9x10^8 comparisons on one task.
    // The merged-interval path collapses the hits to ONE interval and
    // finishes in linear time; a clean tail after the quote must survive.
    val quote = (0 until 30000).map(i => s"w${i % 4096}").mkString(" ")
    val d = Seq(
      (1L, quote),                    // 100% contaminated
      (2L, quote + " clean tail here tokens")  // contaminated prefix, clean suffix
    ).toDF("doc_id", "text")
    val bench = Seq(quote).toDF("text")
    val t0 = System.nanoTime()
    val out = Decontaminate.exciseContaminated(d, bench, n = 8).orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out(0) == ((1L, "", 30000L, 30000L)))
    // windows mixing quote and tail tokens are NOT benchmark members, so
    // the hit union is exactly [0, 29999] and the tail survives whole
    assert(out(1) == ((2L, "clean tail here tokens", 30004L, 30000L)))
    assert(secs < 90.0, f"long-doc excision took $secs%.1f s - interval merge regressed?")
  }

  test("agrees with Dedup.contaminationFlags on the shared semantics") {
    // same shingle length + threshold: the two formulations (bloom-prefiltered
    // vs plain join) must flag the same docs with the same counts
    val a = Decontaminate.ngramOverlap(corpus, bench, n = 3, minHits = 2)
      .select($"doc_id", $"n_hit".as("n"), $"contaminated").orderBy($"doc_id")
    val b = Dedup.contaminationFlags(corpus, bench, shingleK = 3, minShared = 2)
      .select($"doc_id", $"n_shared".as("n"), $"contaminated").orderBy($"doc_id")
    assert(a.collect().toSeq == b.collect().toSeq)
  }
}
