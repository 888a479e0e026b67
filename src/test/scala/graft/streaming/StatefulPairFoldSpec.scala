package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the shared stateful-fold algebra — in particular the
  * timeout re-arming contract: Spark clears a group's timeout on every
  * invocation, so ANY state left behind must come with a timeout or the
  * group leaks forever once arrivals stop.
  */
class StatefulPairFoldSpec extends AnyFunSuite {

  private case class D(id: Long, ts: Long)
  // pair everything (threshold-free) — these tests exercise the state
  // algebra, not a scorer
  private def allPairs(a: D, b: D): Option[(Long, Long)] =
    Some(if (a.id < b.id) (a.id, b.id) else (b.id, a.id))

  private def step(
      prior: List[D], tomb: List[Long], arrivals: Seq[D],
      hasTimedOut: Boolean = false, wm: Long = 0L,
      retMs: Option[Long] = Some(100L), timeoutsOn: Boolean = true,
      cap: Int = 10, tombCap: Int = 10) =
    StatefulPairFold.step[D, (Long, Long)](prior, tomb, arrivals.iterator,
      hasTimedOut, wm, retMs, timeoutsOn, cap, tombCap, _.id, _.ts, allPairs)

  test("EVERY surviving state carries a timeout when timeouts are on") {
    // live entries: re-armed off the newest entry
    val live = step(List(D(1, 50)), Nil, Seq(D(2, 60)))
    assert(!live.remove && live.timeoutAt.contains(60L + 100L + 1L))
    // tombstone-only state (the r19 leak): STILL armed, one retention
    // window past the watermark, so the timeout branch can GC it later
    val tombOnly = step(List(D(1, 50)), Nil, Seq.empty, wm = 200L)
    assert(!tombOnly.remove, "retention eviction must tombstone, not drop")
    assert(tombOnly.kept.isEmpty && tombOnly.tomb == List(1L))
    assert(tombOnly.timeoutAt.contains(200L + 100L + 1L),
      "tombstone-only state left unarmed is never invoked again — a leak")
  }

  test("empty state removes the group instead of writing an empty row") {
    val s = step(Nil, Nil, Seq.empty)
    assert(s.remove && s.timeoutAt.isEmpty && s.out.isEmpty)
  }

  test("timeout invocation GCs an all-expired group, re-arms a live one") {
    val gone = step(List(D(1, 50)), List(9L), Seq.empty,
      hasTimedOut = true, wm = 200L)
    assert(gone.remove, "expired live set: tombstones die with it")
    val alive = step(List(D(1, 150), D(2, 180)), Nil, Seq.empty,
      hasTimedOut = true, wm = 200L)
    assert(!alive.remove && alive.kept.map(_.id).toSet == Set(1L, 2L))
    assert(alive.timeoutAt.contains(180L + 100L + 1L))
  }

  test("tombstoned and live ids are structural no-ops on re-delivery") {
    val s = step(List(D(1, 50)), List(7L), Seq(D(7, 60), D(1, 60), D(2, 60)))
    // only doc 2 is fresh: one pair against the held doc 1, nothing re-enters
    assert(s.out == Seq((1L, 2L)))
    assert(s.kept.map(_.id).toSet == Set(1L, 2L))
  }

  test("cap eviction tombstones newest-first under the budget") {
    val s = step(List(D(1, 50), D(2, 55)), List(8L, 9L),
      Seq(D(3, 60)), cap = 2, tombCap = 2)
    assert(s.kept.size == 2)
    // the cap-evicted id leads; the budget drops the OLDEST tombstone (9)
    assert(s.tomb == List(2L, 8L))
  }

  test("batch mode (timeouts off) arms nothing and holds everything") {
    val s = step(List(D(1, 50)), Nil, Seq(D(2, 60)),
      retMs = None, timeoutsOn = false, wm = Long.MinValue)
    assert(s.timeoutAt.isEmpty && !s.remove && s.kept.size == 2)
    assert(s.out == Seq((1L, 2L)))
  }
}
