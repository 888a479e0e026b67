package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SEMANTIC dedup-on-ingest: the streaming complement of
  * [[graft.dedup.SemDeDup]] — the paraphrase-tier sibling of
  * [[StreamingDedup]]'s verbatim near-dup detection.
  *
  * SemDeDup's cluster-scoped structure is incremental by construction, the
  * same way LSH banding is: a document can only be a semantic duplicate of
  * documents assigned to the SAME centroid cell (Abbas et al. 2023 compare
  * within k-means cells only), so per-cell embedding state is the complete
  * sufficient statistic and ingest cost tracks cell occupancy — never
  * corpus size. Each arriving vector assigns to its cell against the
  * BROADCAST centroids (k × dim model state in the task closure, one fused
  * loop per centroid) and scores only against that cell's retained
  * embeddings. Total state is bounded by k × `maxPerCell` × dim even
  * without retention — cells are fixed in number, unlike LSH buckets.
  *
  * Same formulas end to end as the batch path, so streamed and batch
  * results can never silently diverge: the cosine loop is
  * [[graft.expressions.CosineSimilarity]]'s evaluation order exactly
  * (index-order accumulation, `sqrt(na)·sqrt(nb)` denominator, ÷0 → 0),
  * and the assignment tie-break is
  * [[graft.similarity.Similarity.assignEmbeddings]]'s max-(score, cid)
  * struct (higher cosine wins, ties to the larger cid) — spec'd in
  * StreamingSemDeDupSpec by literal pair-set equality against the batch
  * [[graft.dedup.SemDeDup.semanticDedup]] edge set, batch AND
  * streamed-in-halves.
  *
  * Emitted pairs feed [[IncrementalClusters.foldPairs]] unchanged (the
  * same (id_a, id_b) shape [[StreamingDedup]] emits), which closes the
  * ingest loop for the semantic tier: arriving paraphrases land in the
  * same incrementally-maintained cluster assignment as verbatim near-dups.
  *
  * RE-INGEST IDEMPOTENCE and STATE BOUNDS follow [[StreamingDedup]]'s
  * discipline: a doc id re-delivered to its cell is a structural no-op
  * (retained ids plus [[TombstonesPerDoc]] × cap id-only tombstones,
  * covering BOTH cap- and retention-evicted ids — so the no-op contract
  * holds as far as the tombstone budget reaches, not just within the
  * retention window);
  * per-cell state is capped at `maxPerCell` embeddings (newest retained —
  * a cell past the cap holds that many same-cell documents, and new
  * arrivals still score against the retained ones). RETENTION
  * (`retention = Some(d)`) is E111's event-time window verbatim: a pair
  * emits only when the two docs' event times lie within `d` of each other
  * (deterministic — never watermark-timing-dependent), cell entries evict
  * once the watermark passes ts + `d`, and event-time timeouts GC idle
  * cells — dedup against a sliding window instead of all history. Works
  * unchanged on a BATCH frame (state starts empty, every pair is
  * within-batch; in retention mode the within-`d` rule still applies).
  */
object StreamingSemDeDup {

  /** One retained embedding: doc id + its vector + event-time millis
    * (0 outside retention mode).
    */
  case class CellDoc(id: Long, vec: Array[Double], ts: Long)

  /** Per-cell state: retained embeddings (newest first, capped) plus
    * id-only tombstones of cap-evicted docs (re-delivery stays a no-op
    * well past the cap).
    */
  case class CellState(docs: List[CellDoc], tomb: List[Long])

  /** An emitted semantic-duplicate candidate: id_a < id_b,
    * cos = their exact cosine (already ≥ the threshold — no downstream
    * verify needed, unlike MinHash's estimate).
    */
  case class SemPair(id_a: Long, id_b: Long, cos: Double)

  /** Tombstone budget per retained embedding slot — one Long against a
    * dim-sized vector, same 8-bytes-vs-payload argument as
    * [[StreamingDedup.TombstonesPerSig]].
    */
  val TombstonesPerDoc = 64

  /** [[graft.expressions.CosineSimilarity]]'s evaluation, replicated
    * bit-for-bit (index-order accumulation, min-length prefix, ÷0 → 0) so
    * streamed pairs carry the exact cosine the batch plan computes.
    */
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = a(i); val yi = b(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Per-cell occupancy of a [[semanticPairs]] query, read from its OWN
    * state store (Spark's `statestore` data source over the checkpoint —
    * no touch on the running stream): one row per live cell,
    * `(cell, retained, tombstones)`.
    *
    * This is the CENTROID-DRIFT alarm for a months-long ingest: with a
    * healthy fit, cells hold ~N/k retained docs each; as the embedding
    * distribution drifts, arrivals concentrate in few cells — more cosine
    * comparisons per arrival (cost) and one mega-cell scoring against its
    * cap while other cells starve (recall). Alert when max/mean retained
    * occupancy exceeds a small factor ([[occupancySkew]]). The RE-FIT
    * recipe needs no state migration: train fresh centroids on a recent
    * embedding window ([[graft.similarity.Similarity.trainCentroids]]),
    * start a NEW [[semanticPairs]] query (fresh checkpoint) against them,
    * and keep folding its pairs into the SAME clusters table —
    * [[IncrementalClusters.foldPairs]] is idempotent to re-emitted pairs
    * (already-clustered pairs contract to self-loops), so overlap between
    * the old and new queries folds as a no-op.
    *
    * @param checkpoint the query's `checkpointLocation`
    */
  def cellOccupancy(spark: org.apache.spark.sql.SparkSession, checkpoint: String): DataFrame =
    spark.read.format("statestore").option("path", checkpoint).load()
      // flatMapGroupsWithState state rows: key = the group key ("value"
      // for a primitive), value.groupState = the CellState product
      .select(col("key.value").as("cell"),
        size(col("value.groupState.docs")).as("retained"),
        size(col("value.groupState.tomb")).as("tombstones"))

  /** max/mean retained occupancy over ALL `k` cells (empty cells count —
    * a fully-collapsed stream has k-fold skew, not 1.0) — 1.0 is perfectly
    * balanced; alert upward of ~3-4x (pick per fleet). 0.0 for empty state.
    */
  def occupancySkew(occupancy: DataFrame, k: Int): Double = {
    require(k >= 1, s"k must be positive, got $k")
    val r = occupancy.agg(
      coalesce(max(col("retained")), lit(0)).cast("double"),
      coalesce(sum(col("retained")), lit(0L)).cast("double")).collect()(0)
    if (r.getDouble(1) == 0.0) 0.0 else r.getDouble(0) / (r.getDouble(1) / k)
  }

  /** Semantic-duplicate pairs over a STREAMING (or batch) embedding frame,
    * emitted incrementally as vectors arrive.
    *
    * Semantics per micro-batch: every arriving vector assigns to its
    * nearest-by-cosine centroid cell and scores against (a) cell-mates
    * from earlier batches (cell state) and (b) earlier docs of the same
    * batch; pairs at or above `threshold` emit once (one cell per doc —
    * never the per-band duplicates LSH banding emits).
    *
    * @param docs       (idCol, vecCol) — vecCol castable to array<double>
    * @param centroids  cluster centers (k × dim) — caller-supplied model
    *                   state ([[graft.similarity.Similarity.trainCentroids]]
    *                   or any external fit), broadcast in the task closure
    * @param threshold  within-cell cosine at or above which two docs are
    *                   semantic duplicates (the paper sweeps 0.9–0.95+)
    * @param maxPerCell retained embeddings per cell (newest kept)
    * @param retention  Some(d): sliding event-time dedup window (see class
    *                   doc); None (default): dedup against all history
    * @param eventTimeCol event-time column (cast to timestamp) read in
    *                   retention mode
    * @param watermarkDelay watermark applied in streaming retention mode
    */
  def semanticPairs(
      docs: DataFrame,
      centroids: Seq[Seq[Double]],
      threshold: Double,
      vecCol: String = "vec",
      idCol: String = "id",
      maxPerCell: Int = 4096,
      retention: Option[java.time.Duration] = None,
      eventTimeCol: String = "event_ts",
      watermarkDelay: String = "0 seconds"): Dataset[SemPair] = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(threshold > 0.0, s"threshold must be positive, got $threshold")
    require(maxPerCell >= 1, "maxPerCell must be positive")
    retention.foreach(d => require(!d.isNegative && !d.isZero,
      "retention must be a positive duration"))
    val spark = docs.sparkSession
    import spark.implicits._
    val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray
    val th = threshold
    val cap = maxPerCell
    val tombCap = TombstonesPerDoc * maxPerCell
    val retMs = retention.map(_.toMillis)
    val streaming = docs.isStreaming

    val tsCol = retention match {
      case Some(_) => unix_millis(col(eventTimeCol).cast("timestamp"))
      case None => lit(0L)
    }
    // the third element re-materializes event time as a TIMESTAMP column:
    // watermark metadata cannot survive the object-pipeline boundary of
    // the map, so in retention mode the watermark is (re)declared on the
    // keyed frame itself — the attribute the stateful operator checks
    val assigned: Dataset[(Int, CellDoc, java.sql.Timestamp)] = docs
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"), tsCol.as("ts"))
      .as[(Long, Seq[Double], Long)]
      .map { case (id, v, ts) =>
        val vec = v.toArray
        // assignEmbeddings' max-(score, cid) struct: strictly-greater
        // score wins, equal score falls to the LARGER cid — iterating
        // cells upward with >= replicates both (Double.compare orders NaN
        // greatest, matching Spark's struct ordering)
        var bestC = 0
        var bestS = cosine(vec, cents(0))
        var c = 1
        while (c < cents.length) {
          val s = cosine(vec, cents(c))
          if (java.lang.Double.compare(s, bestS) >= 0) { bestS = s; bestC = c }
          c += 1
        }
        (bestC, CellDoc(id, vec, ts), new java.sql.Timestamp(ts))
      }
    val tagged =
      if (retMs.isDefined && streaming) assigned.withWatermark("_3", watermarkDelay)
      else assigned

    val timeoutConf =
      if (retMs.isDefined && streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    tagged
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: Int, it: Iterator[(Int, CellDoc, java.sql.Timestamp)],
            state: GroupState[CellState]) => {
          // the retention/tombstone/pairing/timeout algebra is
          // [[StatefulPairFold.step]] — ONE definition shared with the
          // verbatim tier; this wiring owns only the cell state class,
          // the exact-cosine scorer, and the Spark state handle
          val prior = state.getOption.getOrElse(CellState(Nil, Nil))
          val wm = if (retMs.isDefined && streaming) state.getCurrentWatermarkMs() else Long.MinValue
          val st = StatefulPairFold.step[CellDoc, SemPair](
            prior.docs, prior.tomb, it.map(_._2), state.hasTimedOut, wm, retMs,
            timeoutsOn = retMs.isDefined && streaming, cap = cap, tombCap = tombCap,
            id = _.id, ts = _.ts,
            pair = (d, o) => {
              val s = cosine(d.vec, o.vec)
              if (s >= th)
                Some(if (d.id < o.id) SemPair(d.id, o.id, s)
                     else SemPair(o.id, d.id, s))
              else None
            })
          if (st.remove) state.remove()
          else {
            state.update(CellState(st.kept, st.tomb))
            st.timeoutAt.foreach(state.setTimeoutTimestamp)
          }
          st.out.iterator
        })
  }
}
