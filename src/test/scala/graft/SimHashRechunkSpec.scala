package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Corpus-size-aware SimHash re-chunking: the wide scheme (3 chunks of
  * 21/21/22 bits, one-sided radius-3 probes) must be OUTPUT-IDENTICAL to
  * the narrow default (4×16, radius-2) — both cover any hamming cut <= 11
  * by the same pigeonhole — while trading probe rows for random bucket
  * collisions. Equality is the correctness claim; the collision-mass
  * measurement is the reason the scheme exists.
  */
class SimHashRechunkSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))
    // plant near-duplicate twins so the compared output is non-trivial
    .unionByName(Tables.documents(spark, sfDir)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))

  test("probeMasks enumerates exactly C(w,<=r) masks, each within width and radius") {
    def choose(n: Int, k: Int): Long =
      (1 to k).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
    for ((w, r) <- Seq((16, 2), (21, 3), (22, 3), (8, 1))) {
      val ms = Dedup.probeMasks(w, r)
      val expect = (0 to r).map(choose(w, _)).sum
      assert(ms.length == expect, s"C($w,<=$r): got ${ms.length}, want $expect")
      assert(ms.distinct.length == ms.length, "masks must be unique")
      assert(ms.forall(m => java.lang.Long.bitCount(m) <= r && (m >> w) == 0L),
        s"every mask within $w bits and popcount <= $r")
    }
  }

  test("wide and narrow chunk schemes produce identical near-dup pairs") {
    def run(scheme: (Seq[Int], Int)) =
      Dedup.simHashCosineNearDups(docs, minTokens = 30, forceScheme = Some(scheme))
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = run((Seq(16, 16, 16, 16), 2))
    val wide = run((Seq(21, 21, 22), 3))
    assert(narrow.nonEmpty, "fixture must yield near-dup pairs (planted twins)")
    assert(narrow == wide,
      s"schemes must agree pair-for-pair: narrow-only=${(narrow -- wide).take(5)} " +
        s"wide-only=${(wide -- narrow).take(5)}")
  }

  test("the wide scheme trades probe rows for measurably fewer random bucket collisions") {
    // signatures that are RANDOM by construction (uniform 64-bit hashes of
    // distinct longs): every collision is a random one, none intrinsic —
    // isolating exactly the term re-chunking controls
    val n = 3000L
    val sigs = spark.range(0, n).select(col("id"), xxhash64(col("id")).as("sig"))
    def collisions(widths: Seq[Int], radius: Int): Long =
      Dedup.simHashCandidateJoin(sigs, widths, radius, identity)
        .filter(col("id") < col("id_b")).count()
    val narrow = collisions(Seq(16, 16, 16, 16), 2)
    val wide = collisions(Seq(21, 21, 22), 3)
    // expected collision mass: pairs × Σ C(wᵢ,<=r)/2^wᵢ — ~0.84% vs ~0.19%
    val pairsN = n * (n - 1) / 2
    assert(narrow > pairsN / 200, s"narrow scheme should collide ~0.84% of $pairsN pairs, got $narrow")
    assert(wide * 3 < narrow,
      s"wide scheme must cut random collisions >= 3x (measured narrow=$narrow wide=$wide, " +
        f"ratio ${narrow.toDouble / wide}%.1f; arithmetic predicts ~4.4x)")
  }

  test("a maxHamming past the scheme's pigeonhole coverage is refused by name") {
    val e = intercept[IllegalArgumentException](
      Dedup.simHashCosineNearDups(docs, maxHamming = 12))
    assert(e.getMessage.contains("pigeonhole"), e.getMessage)
    // the wide scheme covers 3·4−1 = 11 too: 11 is accepted under force
    Dedup.simHashCosineNearDups(docs.limit(10), maxHamming = 11,
      forceScheme = Some((Seq(21, 21, 22), 3))).collect()
    val e2 = intercept[IllegalArgumentException](
      Dedup.simHashCosineNearDups(docs.limit(10), maxHamming = 11,
        forceScheme = Some((Seq(16, 16, 16, 16), 1))))
    assert(e2.getMessage.contains("pigeonhole"), e2.getMessage)
  }
}
