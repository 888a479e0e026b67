package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.TextFunctions

/** The near-dup oracle queries (q40/q41/q49) compare against EXHAUSTIVE
  * exact truth, so they stay green only while every true pair is actually
  * recalled by the banded LSH candidates. For the planted fixture pairs
  * (doc ∪ doc+" zz" / vec ∪ vec+0.01·e0) recall is deterministic GIVEN the
  * fixture — but a fixture/seed regeneration could silently move a planted
  * pair down to the threshold edge, where banded recall is probabilistic,
  * and the failure would surface as a baffling oracle hash mismatch.
  *
  * This spec asserts the margins BY NAME over the actual fixture: every
  * planted pair must clear its similarity threshold with headroom and must
  * be caught by the candidate generation. Regenerate the fixture and these
  * fail with the cause spelled out, not as a q40 hash diff.
  */
class RecallMarginSpec extends SparkSpec {

  // mirrors SparkEntry.docsWithNearDups (the q40/q41 fixture construction)
  private def docsWithDups = {
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    d.union(d.select(col("doc_id") + 1000000, concat(col("text"), lit(" zz"))))
  }

  test("q40 margin: planted pairs clear jaccard 0.5 with headroom AND the bands catch them") {
    val docs = docsWithDups
    val sh = docs.select(col("doc_id").as("id"),
      TextFunctions.shingleHashes(spark, col("text"), 3).as("sh"))
    val planted = sh.filter(col("id") < 1000000)
      .join(sh.select((col("id") - 1000000).as("id"), col("sh").as("sh_b")), "id")
      .withColumn("n_common", size(array_intersect(col("sh"), col("sh_b"))))
      .select(col("id"), (col("n_common").cast("double") /
        (size(col("sh")) + size(col("sh_b")) - col("n_common"))).as("j"))
    val minJ = planted.agg(min(col("j"))).collect()(0).getDouble(0)
    info(f"min planted exact jaccard = $minJ%.4f (threshold 0.5)")
    assert(minJ >= 0.60,
      f"FIXTURE RECALL MARGIN BROKEN: a planted near-dup pair has exact jaccard $minJ%.4f, " +
        "too close to the 0.5 LSH threshold — banded MinHash recall is probabilistic near the " +
        "threshold and q40's exhaustive oracle would mismatch nondeterministically. " +
        "Regenerate with stronger planted similarity or lower the q40 threshold.")

    // deterministic catch: every planted pair must appear in the LSH output
    val out = Dedup.minHashVerifiedNearDups(docs, threshold = 0.5)
      .filter(col("id_b") === col("id_a") + 1000000)
    val nPlanted = planted.count()
    val nCaught = out.count()
    assert(nCaught == nPlanted,
      s"FIXTURE RECALL BROKEN: bands caught $nCaught of $nPlanted planted pairs — " +
        "a planted pair no longer collides in any MinHash band for this fixture+seed.")
  }

  test("q41 margin: eligible planted pairs clear cosine 0.95 + hamming 11 with headroom") {
    val docs = docsWithDups
    // eligibility mirrors the operator's minTokens = 50 cut
    val eligible = docs.filter(TextFunctions.tokenCount(col("text")) >= 50)
    val sigs = Dedup.simHashSignatures(eligible)
    val ham = sigs.filter(col("id") < 1000000)
      .join(sigs.select((col("id") - 1000000).as("id"), col("sig").as("sig_b")), "id")
      .select(bit_count(col("sig").bitwiseXOR(col("sig_b"))).as("h"))
    val maxHam = ham.agg(max(col("h"))).collect()(0).getInt(0)
    info(s"max planted hamming = $maxHam (candidate cut 9, scheme coverage 11)")
    assert(maxHam <= 7,
      s"FIXTURE RECALL MARGIN BROKEN: a planted pair's SimHash hamming distance is $maxHam; " +
        "the operator's candidate cut is hamming <= 9 (chosen from measured true-pair " +
        "concentration; the probe scheme covers up to 11) — a regen pushed the fixture toward " +
        "the cut and q41's exhaustive oracle would mismatch. Widen maxHamming toward 11 or " +
        "regenerate with stronger planted similarity.")

    val nEligible = eligible.filter(col("doc_id") < 1000000)
      .join(eligible.select((col("doc_id") - 1000000).as("doc_id")), "doc_id")
      .count()
    val out = Dedup.simHashCosineNearDups(docs, minTokens = 50, cosThreshold = 0.95)
      .filter(col("id_b") === col("id_a") + 1000000)
    val minCos = out.agg(min(col("cos"))).collect()(0).getDouble(0)
    info(f"min planted exact cosine = $minCos%.5f over ${out.count()} caught of $nEligible eligible")
    assert(out.count() == nEligible,
      s"FIXTURE RECALL BROKEN: ${out.count()} of $nEligible eligible planted pairs caught by q41.")
    assert(minCos >= 0.97,
      f"FIXTURE RECALL MARGIN BROKEN: planted cosine $minCos%.5f too close to the 0.95 threshold.")
  }

  test("negative control: a threshold-edge pair TRIPS the jaccard margin check") {
    import spark.implicits._
    // two docs sharing ~55% of shingles — a legal true pair (j > 0.5) that
    // banded recall would catch only probabilistically; the margin predicate
    // must flag exactly this shape
    // 25 shared + 9 private tokens each: shared 3-shingles = 23, per-doc
    // shingles = 32 → j = 23/(64-23) ≈ 0.561
    val shared = (1 to 25).map(i => s"tok$i").mkString(" ")
    val extraA = (1 to 9).map(i => s"aa$i").mkString(" ")
    val extraB = (1 to 9).map(i => s"bb$i").mkString(" ")
    val docs = Seq((1L, s"$shared $extraA"), (1000001L, s"$shared $extraB"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id").as("id"),
      TextFunctions.shingleHashes(spark, col("text"), 3).as("sh"))
    val j = sh.filter(col("id") < 1000000)
      .join(sh.select((col("id") - 1000000).as("id"), col("sh").as("sh_b")), "id")
      .withColumn("n_common", size(array_intersect(col("sh"), col("sh_b"))))
      .select((col("n_common").cast("double") /
        (size(col("sh")) + size(col("sh_b")) - col("n_common"))).as("j"))
      .collect()(0).getDouble(0)
    info(f"control pair jaccard = $j%.4f")
    assert(j > 0.5 && j < 0.60,
      f"control corpus no longer sits in the margin zone (j=$j%.4f) — rebuild it")
  }

  test("q49 margin: planted twin vectors clear cosine 0.99 with headroom and are caught") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val pert = base.select((col("id") + 1000000).as("id"),
      transform(col("vec"), (x, i) => when(i === 0, x + 0.01).otherwise(x)).as("vec"))
    val both = base.union(pert)
    val twinCos = base
      .join(pert.select((col("id") - 1000000).as("id"), col("vec").as("vec_b")), "id")
      .select(graft.similarity.Similarity.nativeCosine(spark, col("vec"), col("vec_b")).as("c"))
    val minCos = twinCos.agg(min(col("c"))).collect()(0).getDouble(0)
    info(f"min planted twin cosine = $minCos%.6f (threshold 0.99)")
    assert(minCos >= 0.995,
      f"FIXTURE RECALL MARGIN BROKEN: a planted embedding twin's cosine is $minCos%.6f, " +
        "too close to q49's 0.99 threshold — hyperplane-band recall degrades near the edge.")
    val nCaught = Dedup.embeddingNearDups(both, threshold = 0.99)
      .filter(col("id_b") === col("id_a") + 1000000).count()
    val nPlanted = base.count()
    assert(nCaught == nPlanted,
      s"FIXTURE RECALL BROKEN: $nCaught of $nPlanted planted twins caught by the banded LSH.")
  }
}
