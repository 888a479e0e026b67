package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup

/** Dedup-on-ingest: the streaming complement of [[graft.dedup.Dedup]]'s
  * banded MinHash-LSH pipeline.
  *
  * A training-data ingest pipeline wants near-duplicates flagged as
  * documents ARRIVE, not by re-running a corpus-wide batch job per drop.
  * The LSH structure makes that incremental by construction: a new
  * document can only be a candidate against prior documents sharing one of
  * its band buckets, so per-bucket signature state is the complete
  * sufficient statistic and ingest cost tracks bucket occupancy — never
  * corpus size.
  *
  * Same formula end to end as the batch path: shingle hashes from the
  * codegen'd [[graft.functions.TextFunctions.shingleHashes]] expression,
  * signatures from [[Dedup.permParams]]'s universal-hash permutations
  * (`min((h mod P)·a + b mod P)` per permutation — a shared definition, so
  * batch and stream can never silently diverge), banding by EXACT equality
  * of the band's signature rows (the batch path compares band hashes of
  * those rows; equal rows ⇒ equal hashes, so the candidate sets agree —
  * spec'd in StreamingDedupSpec by literal set equality against
  * [[Dedup.minHashNearDups]] on the same corpus).
  */
object StreamingDedup {

  /** One band bucket: band index + the band's signature rows rendered as
    * the grouping key (exact equality — no hash collisions).
    */
  case class BandKey(band: Int, key: String)

  /** A document's id, full MinHash signature (carried into bucket state
    * for pair scoring), and event-time millis (0 outside retention mode).
    *
    * Signature entries are INTS, not longs (r21): every MinHash value is
    * `(a·h + b) mod P` with P = 2³¹ − 1, so it always fits an Int, and the
    * signature is the row's dominant payload — carried once per band (16×
    * per doc) through the groupByKey shuffle and held in every bucket's
    * state. Halving the entry type cut the operator's measured shuffle
    * volume 58.2 → 44.0 MB on the sf0.1 bench corpus (the band-key
    * strings and row overhead carry the rest) and halved the signatures'
    * state footprint, with bit-identical pairing (equality of exact
    * values — guide §2.3 "narrower types").
    */
  case class DocSig(id: Long, sig: Array[Int], ts: Long)

  /** Per-bucket state: retained signatures (newest first, capped at
    * `maxPerBucket`) plus an id-only tombstone list of CAP-evicted doc ids
    * (newest first, capped at [[TombstonesPerSig]] × cap) so a re-delivered
    * id stays a no-op for a while after its signature aged out of the cap.
    */
  case class BucketState(sigs: List[DocSig], tomb: List[Long])

  /** An emitted candidate: id_a < id_b, est_jaccard = fraction of matching
    * signature positions (the batch pipeline's estimate).
    */
  case class CandidatePair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Tombstone budget per retained signature slot: a tombstone is one
    * Long (8 bytes) against a signature's k Longs (~512 bytes at k=64),
    * so 64 tombstones per slot keeps total bucket state within ~2× the
    * signature budget while covering re-deliveries far older than the cap.
    */
  val TombstonesPerSig = 64

  /** Per-bucket occupancy of a [[nearDupCandidates]] query, read from its
    * OWN state store (Spark's `statestore` source over the checkpoint — no
    * touch on the running stream): one row per live band bucket,
    * `(band, bucket, retained, tombstones)`.
    *
    * This is the HOT-BUCKET alarm for a months-long ingest — the LSH
    * tier's drift-equivalent of [[StreamingSemDeDup.cellOccupancy]]'s
    * centroid-drift readout: on healthy diverse text, band signatures
    * spread documents so buckets hold a handful of near-duplicates each;
    * a boilerplate-heavy stream (templated pages, log spam) concentrates
    * arrivals into few buckets, where each arrival pays cap-bounded
    * comparisons (cost) and the bucket saturates `maxPerBucket` while
    * recall past the cap erodes. Alert when [[bucketSkew]] exceeds a
    * small factor; the remediation is upstream (strip the boilerplate
    * before shingling, or raise `shingleK`) — bucket state needs no
    * migration, because fresh content re-spreads on its own signatures.
    *
    * @param checkpoint the query's `checkpointLocation`
    */
  def bucketOccupancy(spark: org.apache.spark.sql.SparkSession, checkpoint: String): DataFrame =
    spark.read.format("statestore").option("path", checkpoint).load()
      // flatMapGroupsWithState state rows: a case-class group key reads as
      // key.<field>, the state product as value.groupState.<field>
      .select(col("key.band").as("band"), col("key.key").as("bucket"),
        size(col("value.groupState.sigs")).as("retained"),
        size(col("value.groupState.tomb")).as("tombstones"))

  /** max/mean retained occupancy over the LIVE buckets — unlike
    * [[StreamingSemDeDup.occupancySkew]]'s fixed-k denominator, LSH
    * buckets are open-ended (one per distinct band signature), so skew is
    * relative to the live population: ~1–2× on healthy diverse text
    * (most buckets hold one or a few similar docs), an order of magnitude
    * higher when boilerplate concentrates a stream into hot buckets.
    * 0.0 for empty state.
    */
  def bucketSkew(occupancy: DataFrame): Double = {
    val r = occupancy.agg(
      coalesce(max(col("retained")), lit(0)).cast("double"),
      coalesce(avg(col("retained")), lit(0.0))).collect()(0)
    if (r.getDouble(1) == 0.0) 0.0 else r.getDouble(0) / r.getDouble(1)
  }

  /** Near-duplicate candidate pairs over a STREAMING (or batch) document
    * frame, emitted incrementally as documents arrive.
    *
    * Semantics per micro-batch: every arriving doc is scored against (a)
    * bucket-mates that arrived in earlier batches (bucket state) and (b)
    * earlier docs of the same batch, and pairs with est_jaccard ≥
    * `threshold` are emitted (pass 0.0 to emit every bucket-colliding
    * pair — the input [[Dedup.verifyPairsExactJaccard]] expects). A pair
    * sharing several bands is emitted once per shared band (bands are
    * independent state groups) — dedupe downstream with
    * `dropDuplicates("id_a", "id_b")` where it matters.
    *
    * RE-INGEST IDEMPOTENCE: a doc id re-delivered to a bucket it already
    * occupies is a structural no-op. The guarantee covers ids whose
    * signature is still retained plus the newest [[TombstonesPerSig]] ×
    * `maxPerBucket` ids evicted by the cap OR by `retention` (kept as
    * 8-byte tombstones); an id older than both windows is treated as a
    * fresh arrival again.
    *
    * State per bucket is capped at `maxPerBucket` signatures (newest
    * retained): a bucket past the cap holds that many mutually-similar
    * documents, so new arrivals still collide with the retained ones and
    * land in the same dedup cluster downstream; the cap bounds state
    * growth on degenerate keys (empty-ish documents) the way LSH
    * deployments do. Signatures are computed per row in plain JVM code
    * (the k-wide min-fold over one doc's shingles — no corpus-wide
    * aggregation, nothing driver-side).
    *
    * RETENTION (`retention = Some(d)`): dedup against a sliding window
    * instead of all history — the only way total state stays bounded on a
    * continuous 100 TB ingest, where per-bucket lists otherwise grow with
    * corpus size forever. Event time is read from `eventTimeCol` (cast to
    * timestamp); a pair is emitted only when the two docs' event times lie
    * within `d` of each other (deterministic — never a function of
    * watermark timing), and bucket entries are EVICTED once the watermark
    * passes their timestamp + `d` (they can no longer pair with any
    * non-late arrival). Streaming queries get
    * `withWatermark(eventTimeCol, watermarkDelay)` applied here and
    * event-time timeouts GC whole buckets that stop receiving data. Docs
    * arriving later than the watermark may miss pairs against
    * already-evicted partners — the standard watermark trade. Without
    * `retention` (default) nothing expires: dedup-against-all-history.
    *
    * Works unchanged on a BATCH frame (state starts empty, every pair is
    * within-batch): `flatMapGroupsWithState` is defined for both; in
    * retention mode the within-`d` pair rule still applies but no
    * watermark/timeout machinery runs.
    */
  def nearDupCandidates(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 64,
      shingleK: Int = 3,
      bands: Int = 16,
      threshold: Double = 0.5,
      seed: Long = 42L,
      maxPerBucket: Int = 256,
      retention: Option[java.time.Duration] = None,
      eventTimeCol: String = "event_ts",
      watermarkDelay: String = "0 seconds"): Dataset[CandidatePair] = {
    require(k % bands == 0, "bands must divide k")
    require(maxPerBucket >= 1, "maxPerBucket must be positive")
    retention.foreach(d => require(!d.isNegative && !d.isZero,
      "retention must be a positive duration"))
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    val perms = Dedup.permParams(k, seed).toArray
    val p = Dedup.MinHashP
    val kk = k
    val th = threshold
    val cap = maxPerBucket
    val tombCap = TombstonesPerSig * maxPerBucket
    val retMs = retention.map(_.toMillis)
    val streaming = docs.isStreaming

    val tsCol = retention match {
      case Some(_) => unix_millis(col(eventTimeCol).cast("timestamp"))
      case None => lit(0L)
    }
    val hashed = docs
      .select(col(idCol).cast("long").as("id"),
        graft.functions.TextFunctions.shingleHashes(spark, col(textCol), shingleK).as("sh"),
        tsCol.as("ts"))
      .as[(Long, Seq[Long], Long)]

    // per-doc signature + band keys; docs with no shingles drop, like the
    // batch path (explode emits no rows for them). The third element
    // re-materializes the event time as a TIMESTAMP column: watermark
    // metadata cannot survive the object-pipeline boundary of this
    // flatMap, so in retention mode the watermark is (re)declared on the
    // keyed frame itself — the attribute the stateful operator checks.
    val keyed: Dataset[(BandKey, DocSig, java.sql.Timestamp)] =
      hashed.flatMap { case (id, sh, ts) =>
        if (sh.isEmpty) Iterator.empty
        else {
          // values are mod P = 2³¹ − 1: Int.MaxValue (= P) is a safe
          // "no shingle yet" sentinel and every real value stays below it
          val sig = Array.fill(kk)(Int.MaxValue)
          sh.foreach { h =>
            val hm = java.lang.Math.floorMod(h, p)
            var i = 0
            while (i < kk) {
              val v = java.lang.Math.floorMod(hm * perms(i)._1 + perms(i)._2, p).toInt
              if (v < sig(i)) sig(i) = v
              i += 1
            }
          }
          val d = DocSig(id, sig, ts)
          val t = new java.sql.Timestamp(ts)
          (0 until sig.length / rows).iterator.map { b =>
            (BandKey(b, sig.slice(b * rows, (b + 1) * rows).mkString(",")), d, t)
          }
        }
      }
    val tagged =
      if (retMs.isDefined && streaming) keyed.withWatermark("_3", watermarkDelay)
      else keyed

    def est(a: Array[Int], b: Array[Int]): Double = {
      var m = 0; var i = 0
      while (i < a.length) { if (a(i) == b(i)) m += 1; i += 1 }
      m.toDouble / a.length
    }

    val timeoutConf =
      if (retMs.isDefined && streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    tagged
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: BandKey, it: Iterator[(BandKey, DocSig, java.sql.Timestamp)],
            state: GroupState[BucketState]) => {
          // the retention/tombstone/pairing/timeout algebra is
          // [[StatefulPairFold.step]] — ONE definition shared with the
          // semantic tier; this wiring owns only the bucket state class,
          // the signature-estimate scorer, and the Spark state handle
          val prior = state.getOption.getOrElse(BucketState(Nil, Nil))
          val wm = if (retMs.isDefined && streaming) state.getCurrentWatermarkMs() else Long.MinValue
          val st = StatefulPairFold.step[DocSig, CandidatePair](
            prior.sigs, prior.tomb, it.map(_._2), state.hasTimedOut, wm, retMs,
            timeoutsOn = retMs.isDefined && streaming, cap = cap, tombCap = tombCap,
            id = _.id, ts = _.ts,
            pair = (d, o) => {
              val e = est(d.sig, o.sig)
              if (e >= th)
                Some(if (d.id < o.id) CandidatePair(d.id, o.id, e)
                     else CandidatePair(o.id, d.id, e))
              else None
            })
          if (st.remove) state.remove()
          else {
            state.update(BucketState(st.kept, st.tomb))
            st.timeoutAt.foreach(state.setTimeoutTimestamp)
          }
          st.out.iterator
        })
  }
}
