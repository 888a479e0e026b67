package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching — the entity-resolution shape: cheap COMPLETE
  * blocking generates candidates, the exact string metric verifies only
  * candidates, so precision is exact and recall provably 100%.
  */
object FuzzyJoin {

  /** Self-join pairs within Levenshtein distance `maxDist`.
    *
    * Blocking is sound for edit distance because `|len(a) − len(b)| ≤
    * maxDist` for any qualifying pair: bucketing lengths at width
    * (maxDist+1) and probing both the own and the next bucket guarantees
    * every qualifying pair shares a block (two lengths within maxDist sit
    * in the same or adjacent buckets). Verification computes the exact
    * distance on candidates only — never all pairs.
    *
    * Length blocking is the sound-complete BASELINE; highly uniform-length
    * corpora (sequential ids, fixed-width codes) should conjoin a domain
    * blocking key (`extraBlockCol`) to keep blocks small — soundness is
    * then the caller's contract (rows in different extra blocks are never
    * compared).
    *
    * @return (id_a, id_b, dist) with id_a < id_b and dist ≤ maxDist
    */
  def levenshteinPairs(
      df: DataFrame,
      textCol: String = "name",
      idCol: String = "id",
      maxDist: Int = 2,
      extraBlockCol: Option[String] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val w = maxDist + 1
    val extra = extraBlockCol.map(col).getOrElse(lit(""))
    val probes = df
      .select(col(idCol).as("id"), col(textCol).as("name"),
        // integer division — a double divide + cast truncates the same way
        // here but `div` states the intent and is exact at any length
        expr(s"length(`$textCol`) div $w").as("b"),
        extra.as("xb"))
      .select(col("id"), col("name"), col("xb"),
        explode(array(col("b"), col("b") + 1)).as("blk"))
    val pairs = probes
      .join(probes
        .select(col("id").as("id_b"), col("name").as("name_b"),
          col("xb").as("xb_b"), col("blk")),
        Seq("blk"))
      // null-safe block equality: a NULL extraBlockCol is a block of its
      // own (NULL rows still pair with each other) — plain `===` would
      // evaluate NULL and silently drop them, exact duplicates included
      .filter(col("id") < col("id_b") && col("xb") <=> col("xb_b"))
      .select(col("id").as("id_a"), col("id_b"), col("name"), col("name_b"))
      .dropDuplicates("id_a", "id_b") // a pair can share both probed blocks
    pairs
      .select(col("id_a"), col("id_b"), levenshtein(col("name"), col("name_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Diagnostic BLOCK-OCCUPANCY histogram for [[levenshteinPairs]] with the
    * same arguments: one row per (probe block, extra block) with the number
    * of probe rows it holds, largest first.
    *
    * The verify stage generates ~Σ_b n_b² candidate rows, so the histogram
    * IS the cost model: max occupancy ~√(2·candidates) is the number to
    * watch before running the join at scale. A uniform-length corpus
    * (fixed-width codes, sequential ids) collapses into ONE length block —
    * occupancy ≈ corpus size, candidates ≈ n²/2 — which is exactly when
    * the `extraBlockCol` domain key must be conjoined. Cost of the
    * diagnostic itself: one groupBy over the probe expansion (O(2n) rows),
    * independent of candidate volume — always safe to run first.
    */
  def blockOccupancy(
      df: DataFrame,
      textCol: String = "name",
      maxDist: Int = 2,
      extraBlockCol: Option[String] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val w = maxDist + 1
    val extra = extraBlockCol.map(col).getOrElse(lit(""))
    df.select(expr(s"length(`$textCol`) div $w").as("b"), extra.as("xb"))
      .select(col("xb"), explode(array(col("b"), col("b") + 1)).as("blk"))
      .groupBy(col("blk"), col("xb")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("blk"), col("xb"))
  }
}
