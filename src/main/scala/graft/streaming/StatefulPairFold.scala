package graft.streaming

/** The ONE state machine behind the stateful dedup-on-ingest folds —
  * [[StreamingDedup]]'s LSH buckets and [[StreamingSemDeDup]]'s centroid
  * cells run the same per-group algebra: retention-evict prior entries
  * against the watermark, tombstone evictions under a budget, filter
  * re-delivered arrivals through (live ∪ tombstones), pair each fresh
  * arrival against the held entries in deterministic id order, split at
  * the occupancy cap, and re-arm the event-time timeout. The two tiers
  * previously inlined near-verbatim copies, and a fix to the shared
  * semantics (the r19 tombstone-GC timeout) had to land twice — this
  * factoring makes drift structurally impossible. Pure function of its
  * inputs: callers own the Spark wiring (groupByKey /
  * flatMapGroupsWithState / encoders / state classes), so the payload
  * type, the similarity scorer, and the emitted pair shape stay
  * tier-specific.
  */
private[streaming] object StatefulPairFold {

  /** One group invocation's outcome: the state to write back (`remove` =
    * drop the group entirely), the event-time timeout to arm (None =
    * leave unarmed — batch / no-retention mode), and the pairs to emit.
    */
  final case class Step[P, O](
      kept: List[P], tomb: List[Long], remove: Boolean,
      timeoutAt: Option[Long], out: Seq[O])

  /** @param priorEntries the group's held payloads before this invocation
    * @param priorTomb    tombstoned ids (newest first)
    * @param arrivals     this batch's payloads for the group (data
    *                     invocations; empty on a timeout invocation)
    * @param hasTimedOut  Spark's timeout-invocation flag
    * @param wm           current watermark ms (Long.MinValue = none)
    * @param retMs        event-time retention window; None = unbounded
    * @param timeoutsOn   whether event-time timeouts are armed (retention
    *                     configured AND a streaming run)
    * @param cap          max held payloads per group (oldest spill to
    *                     tombstones)
    * @param tombCap      tombstone budget per group
    * @param id / ts      payload accessors
    * @param pair         scorer: Some(emitted pair) when the two payloads
    *                     clear the tier's similarity threshold
    */
  def step[P, O](
      priorEntries: List[P], priorTomb: List[Long],
      arrivals: Iterator[P],
      hasTimedOut: Boolean,
      wm: Long,
      retMs: Option[Long],
      timeoutsOn: Boolean,
      cap: Int, tombCap: Int,
      id: P => Long, ts: P => Long,
      pair: (P, P) => Option[O]): Step[P, O] = {
    // retention eviction: an entry whose ts + retention is behind the
    // watermark can no longer pair with any non-late arrival. Evicted ids
    // TOMBSTONE under the same budget as cap evictions, so a doc
    // re-delivered after its window closed (admitted by a non-zero
    // watermark delay) stays a structural no-op instead of re-entering
    // state and re-emitting pairs — the no-op contract holds as far as
    // the tombstone budget reaches, not just the retention window
    val (live, retEvicted) = retMs match {
      case Some(r) if wm > Long.MinValue => priorEntries.partition(e => ts(e) + r >= wm)
      case _ => (priorEntries, Nil)
    }
    val tombAfterRet =
      if (retEvicted.isEmpty) priorTomb
      else (retEvicted.map(id) ++ priorTomb).take(tombCap)
    if (hasTimedOut) {
      // no new data since the timeout was armed: GC what expired —
      // including tombstones, whose useful life ends with the group's
      // last live entry (a later re-delivery is beyond any replay)
      if (live.isEmpty) Step(Nil, Nil, remove = true, None, Nil)
      else Step(live, tombAfterRet, remove = false,
        Some(live.map(ts).max + retMs.get + 1), Nil)
    } else {
      val seen = live.map(id).toSet ++ tombAfterRet
      // deterministic arrival order inside the batch; re-delivered ids no-op
      val fresh = arrivals.filter(e => !seen.contains(id(e)))
        .toSeq.distinctBy(id).sortBy(id)
      val out = Seq.newBuilder[O]
      var held = live
      fresh.foreach { d =>
        held.foreach { o =>
          val inWindow = retMs.forall(r => math.abs(ts(d) - ts(o)) <= r)
          if (inWindow) pair(d, o).foreach(out += _)
        }
        held = d :: held
      }
      val (kept, capEvicted) = held.splitAt(cap)
      val tomb = (capEvicted.map(id) ++ tombAfterRet).take(tombCap)
      if (kept.isEmpty && tomb.isEmpty) Step(Nil, Nil, remove = true, None, out.result())
      else {
        // re-arm on EVERY update: Spark clears a group's timeout each
        // invocation, so a group updated without re-arming would never be
        // invoked again once arrivals stop — tombstone-only state would
        // leak forever. A live group re-arms off its newest entry; a
        // tombstone-only group arms one retention window past the current
        // watermark, after which the timeout branch GCs it (a doc
        // re-delivered later re-enters an EMPTY group: its former
        // partners have expired, so no pair can re-emit — the no-op
        // contract degrades safe)
        val at =
          if (!timeoutsOn) None
          else if (kept.nonEmpty) Some(kept.map(ts).max + retMs.get + 1)
          else Some(math.max(wm, 0L) + retMs.get + 1)
        Step(kept, tomb, remove = false, at, out.result())
      }
    }
  }
}
