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

  /** A document's id and full MinHash signature (carried into bucket state
    * for pair scoring).
    */
  case class DocSig(id: Long, sig: Array[Long])

  /** An emitted candidate: id_a < id_b, est_jaccard = fraction of matching
    * signature positions (the batch pipeline's estimate).
    */
  case class CandidatePair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Near-duplicate candidate pairs over a STREAMING (or batch) document
    * frame, emitted incrementally as documents arrive.
    *
    * Semantics per micro-batch: every arriving doc is scored against (a)
    * bucket-mates that arrived in earlier batches (bucket state) and (b)
    * earlier docs of the same batch, and pairs with est_jaccard ≥
    * `threshold` are emitted. A pair sharing several bands is emitted once
    * per shared band (bands are independent state groups) — dedupe
    * downstream with `dropDuplicates("id_a", "id_b")` where it matters; a
    * doc id re-delivered to a bucket it already occupies is a structural
    * no-op (re-ingest idempotence).
    *
    * State per bucket is capped at `maxPerBucket` signatures (newest
    * retained): a
    * bucket past the cap holds that many mutually-similar documents, so new
    * arrivals still collide with the retained ones and land in the same
    * dedup cluster downstream; the cap bounds state growth on degenerate
    * keys (empty-ish documents) the way LSH deployments do. Signatures are
    * computed per row in plain JVM code (the k-wide min-fold over one doc's
    * shingles — no corpus-wide aggregation, nothing driver-side).
    *
    * Works unchanged on a BATCH frame (state starts empty, every pair is
    * within-batch): `flatMapGroupsWithState` is defined for both.
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
      maxPerBucket: Int = 256): Dataset[CandidatePair] = {
    require(k % bands == 0, "bands must divide k")
    require(maxPerBucket >= 1, "maxPerBucket must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    val perms = Dedup.permParams(k, seed).toArray
    val p = Dedup.MinHashP
    val kk = k
    val th = threshold
    val cap = maxPerBucket

    val hashed = docs
      .select(col(idCol).cast("long").as("id"),
        graft.functions.TextFunctions.shingleHashes(spark, col(textCol), shingleK).as("sh"))
      .as[(Long, Seq[Long])]

    // per-doc signature + band keys; docs with no shingles drop, like the
    // batch path (explode emits no rows for them)
    val keyed: Dataset[(BandKey, DocSig)] = hashed.flatMap { case (id, sh) =>
      if (sh.isEmpty) Iterator.empty
      else {
        val sig = Array.fill(kk)(Long.MaxValue)
        sh.foreach { h =>
          val hm = java.lang.Math.floorMod(h, p)
          var i = 0
          while (i < kk) {
            val v = java.lang.Math.floorMod(hm * perms(i)._1 + perms(i)._2, p)
            if (v < sig(i)) sig(i) = v
            i += 1
          }
        }
        val d = DocSig(id, sig)
        (0 until sig.length / rows).iterator.map { b =>
          (BandKey(b, sig.slice(b * rows, (b + 1) * rows).mkString(",")), d)
        }
      }
    }

    def est(a: Array[Long], b: Array[Long]): Double = {
      var m = 0; var i = 0
      while (i < a.length) { if (a(i) == b(i)) m += 1; i += 1 }
      m.toDouble / a.length
    }

    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: BandKey, it: Iterator[(BandKey, DocSig)], state: GroupState[List[DocSig]]) => {
          val prior = state.getOption.getOrElse(Nil)
          val seen = prior.map(_.id).toSet
          // deterministic arrival order inside the batch; re-delivered ids no-op
          val fresh = it.map(_._2).filter(d => !seen.contains(d.id))
            .toSeq.distinctBy(_.id).sortBy(_.id)
          val out = Seq.newBuilder[CandidatePair]
          var held = prior
          fresh.foreach { d =>
            held.foreach { o =>
              val e = est(d.sig, o.sig)
              if (e >= th)
                out += (if (d.id < o.id) CandidatePair(d.id, o.id, e)
                        else CandidatePair(o.id, d.id, e))
            }
            held = d :: held
          }
          state.update(held.take(cap))
          out.result().iterator
        })
  }
}
