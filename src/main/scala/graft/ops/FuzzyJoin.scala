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
}
