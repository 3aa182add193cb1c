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

  test("a genuine gap still closes the session") {
    val (out, open) = SessionMerge.merge(7L, Some((0L, 0L, 2L)),
      Array(2000 * us), 600 * us)
    out shouldBe Seq((7L, 0L, 2L), (7L, 2000L, 1L))
    open shouldBe Some((2000 * us, 2000 * us, 1L))
  }
}
