package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Cross-batch session-fold semantics (shared by both stateful APIs). */
class SessionMergeSpec extends AnyFunSuite with Matchers {

  private val us = 1000000L

  test("late-but-within-gap events extend the open session, never split it") {
    // batch 1: events at 10:00 (open session start=last=600s)
    val (out1, open1) = SessionMerge.merge(1L, None, Array(600 * us), 600 * us)
    out1.map(_._3) shouldBe Seq(1L)
    // batch 2 delivers LATE events 09:45 and 09:58 plus on-time 10:05:
    // all within the 10-min gap of the true session — one session of 4,
    // started at the EARLIEST event. (The old fold moved `last` back to
    // 09:45, declared 09:58 a gap break, and split the session.)
    val (out2, open2) = SessionMerge.merge(1L, open1,
      Array(585 * us, 598 * us, 605 * us), 600 * us)
    out2 shouldBe Seq((1L, 585L, 4L))
    open2 shouldBe Some((585 * us, 605 * us, 4L))
  }

  test("a late event more than gap BEFORE the open session is its own earlier session") {
    // open session spans [3000s, 3100s]; batch delivers a late event at
    // 1000s — 2000s before start, far beyond the 600s gap. Batch
    // session_window would report two sessions; the old fold could never
    // break on t < last (t - last is negative) and over-merged them into
    // one session with a wrong backward start.
    val (out, open) = SessionMerge.merge(3L, Some((3000 * us, 3100 * us, 5L)),
      Array(1000 * us), 600 * us)
    out shouldBe Seq((3L, 1000L, 1L), (3L, 3000L, 5L))
    open shouldBe Some((3000 * us, 3100 * us, 5L))
  }

  test("late events split into earlier session AND extend the open one in one batch") {
    // open [3000s,3100s]; batch has 900s+950s (earlier session), 2900s
    // (within gap before start → extends backward), 3200s (extends forward)
    val (out, open) = SessionMerge.merge(9L, Some((3000 * us, 3100 * us, 5L)),
      Array(900 * us, 950 * us, 2900 * us, 3200 * us), 600 * us)
    out shouldBe Seq((9L, 900L, 2L), (9L, 2900L, 7L))
    open shouldBe Some((2900 * us, 3200 * us, 7L))
  }

  test("a genuine gap still closes the session") {
    val (out, open) = SessionMerge.merge(7L, Some((0L, 0L, 2L)),
      Array(2000 * us), 600 * us)
    out shouldBe Seq((7L, 0L, 2L), (7L, 2000L, 1L))
    open shouldBe Some((2000 * us, 2000 * us, 1L))
  }
}
