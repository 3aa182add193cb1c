package graft.streaming

import graft.transform.ArbitraryStatefulProcessor
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import scala.collection.mutable.ArrayBuffer

/**
 * Canonical [[ArbitraryStatefulProcessor]]: event-time sessionization as a
 * `flatMapGroupsWithState` state machine — the hand-rolled equivalent of
 * `session_window(ts, gap)` (reference pattern:
 * src/test/scala/com/qwshen/etl/test/stream/UserStatefulProcessor.scala:36-41).
 *
 * Output: (user_id, session_start [epoch sec], cnt). State per key is the
 * open session (start, last, count) in microseconds, carried across
 * micro-batches; each invocation merges the batch's (sorted) events into
 * it and emits every session seen. With a single micro-batch (one input
 * file / AvailableNow) the emitted set is exactly the batch
 * `session_window` result; across multiple batches the still-open session
 * is re-emitted when extended — downstream takes the last emission per
 * (key, session_start), the standard update-sink contract. Caveat of that
 * contract: a late-but-within-gap event can extend a session's start
 * BACKWARD, re-keying it — the superseded (key, old_start) emission is
 * not retracted (append mode cannot), so exact multi-batch consumers
 * should drop a row whose [start, start+gap) span is covered by a later
 * wider emission for the same key.
 *
 * Timestamps are processed as epoch MICROS (`unix_micros`), not
 * `java.sql.Timestamp` — getTime would truncate to millis and diverge
 * from the engine's microsecond session boundaries.
 */
class SessionizeProcessor extends ArbitraryStatefulProcessor {
  private var keyField = "user_id"
  private var tsField = "ts"
  private var gapSec = 1800L

  override def init(properties: Map[String, String]): Unit = {
    properties.get("keyField").foreach(keyField = _)
    properties.get("tsField").foreach(tsField = _)
    properties.get("gapSeconds").foreach(g => gapSec = g.toLong)
  }

  override def transformState(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val gapUs = gapSec * 1000000L
    val typed = df
      .select(col(keyField).cast("long"), unix_micros(col(tsField).cast("timestamp")))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long)], state: GroupState[(Long, Long, Long)]) =>
          val (out, open) = SessionMerge.merge(
            key, state.getOption, it.map(_._2).toArray.sorted, gapUs)
          open.foreach(state.update)
          out.iterator
      }
      .toDF(keyField, "session_start", "cnt")
  }
}

/** The per-key session fold shared by BOTH stateful-API processors — one
 *  implementation, so the two can never diverge on gap semantics. */
private[streaming] object SessionMerge {
  /** Merge sorted event micros into the open session; returns (emitted
   *  sessions — every closed one plus the still-open one — and the new
   *  open-session state (start, last, count)).
   *
   *  The prior open session and each batch event are treated as intervals
   *  and re-merged start-sorted with standard gap semantics. This is what
   *  batch `session_window` computes: a late event more than `gap` BEFORE
   *  the open session's start is a distinct (already-complete) earlier
   *  session, not a backward extension — while a late-but-within-gap event
   *  still widens the session without ever moving `last` backward. */
  def merge(key: Long, open: Option[(Long, Long, Long)], sortedUs: Array[Long],
            gapUs: Long): (Seq[(Long, Long, Long)], Option[(Long, Long, Long)]) = {
    val intervals = ArrayBuffer.empty[(Long, Long, Long)] // (start, last, cnt)
    open.foreach(intervals += _)
    sortedUs.foreach(t => intervals += ((t, t, 1L)))
    if (intervals.isEmpty) return (Nil, None)
    val byStart = intervals.sortBy(iv => (iv._1, iv._2))
    val out = ArrayBuffer.empty[(Long, Long, Long)]
    var (start, last, cnt) = byStart.head
    byStart.iterator.drop(1).foreach { case (s, l, c) =>
      if (s - last > gapUs) {
        out += ((key, Math.floorDiv(start, 1000000L), cnt))
        start = s; last = l; cnt = c
      } else {
        last = math.max(last, l); cnt += c
      }
    }
    out += ((key, Math.floorDiv(start, 1000000L), cnt)) // last one stays open
    (out.toSeq, Some((start, last, cnt)))
  }
}

/**
 * The same sessionization on Spark 4's `transformWithState` — the modern
 * arbitrary-state API (handle-based typed state, RocksDB-backed state
 * store, timers). Registered through the same [[ArbitraryStatefulProcessor]]
 * actor contract, proving the contract is API-agnostic: swap the processor
 * class name in the pipeline definition, nothing else changes.
 *
 * Two emission contracts, chosen by the `timers` property:
 *  - default (`timers` unset / `none`): every session seen is emitted each
 *    batch, open sessions re-emitted when extended — the update-sink
 *    contract shared with [[SessionizeProcessor]] (q74's oracle shape).
 *  - `timers: event`: EVENT-TIME TIMERS close sessions. Only CLOSED
 *    sessions are emitted — either because a later event opened a gap, or
 *    because the watermark passed `last + gap` and the session's armed
 *    timer fired (`handleExpiredTimer`), WITHOUT needing a subsequent
 *    event for that key. Exactly-one emission per session; a session the
 *    watermark never passes (the stream's tail) is deliberately not
 *    emitted, because it is not provably closed. Requires a watermark on
 *    the input view (`withWatermark` upstream) — event-time timers fire
 *    against it.
 */
class SessionizeTwsProcessor extends ArbitraryStatefulProcessor {
  private var keyField = "user_id"
  private var tsField = "ts"
  private var gapSec = 1800L
  private var eventTimers = false

  override def init(properties: Map[String, String]): Unit = {
    properties.get("keyField").foreach(keyField = _)
    properties.get("tsField").foreach(tsField = _)
    properties.get("gapSeconds").foreach(g => gapSec = g.toLong)
    properties.get("timers").foreach {
      case "event" => eventTimers = true
      case "none" | "" => eventTimers = false
      case other => throw new IllegalArgumentException(
        s"SessionizeTwsProcessor: timers must be 'event' or 'none', got '$other'")
    }
  }

  override def transformState(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    TwsSupport.ensureRocksDb(spark)
    val typed = df
      .select(col(keyField).cast("long"), unix_micros(col(tsField).cast("timestamp")))
      .as[(Long, Long)]
    val mode = if (eventTimers) TimeMode.EventTime() else TimeMode.None()
    typed.groupByKey(_._1)
      .transformWithState(new SessionStateMachine(gapSec * 1000000L, eventTimers),
        mode, OutputMode.Append())
      .toDF(keyField, "session_start", "cnt")
  }
}

/** Per-key session state machine (open session as a typed ValueState).
 *  With `eventTimers`, the open session's close is ARMED as an event-time
 *  timer at `last + gap`: each batch re-arms it (delete + register), and
 *  when the watermark passes it without a newer event,
 *  [[handleExpiredTimer]] emits the closed session and clears state — the
 *  mechanism that closes an idle user's session without waiting for their
 *  next event. */
class SessionStateMachine(gapUs: Long, eventTimers: Boolean = false)
  extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var sess: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long)](
      "session", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val prior = if (sess.exists()) Some(sess.get()) else None
    val (out, open) = SessionMerge.merge(key, prior, rows.map(_._2).toArray.sorted, gapUs)
    open.foreach(sess.update)
    if (!eventTimers) out.iterator
    else {
      // re-arm the close timer at the (possibly extended) session end
      open.foreach { case (_, last, _) =>
        val it = getHandle.listTimers()
        while (it.hasNext) getHandle.deleteTimer(it.next())
        getHandle.registerTimer(Math.floorDiv(last + gapUs, 1000L))
      }
      // closed sessions only — merge's LAST emission is the open one,
      // which the timer (or a later gap) will close exactly once
      out.dropRight(1).iterator
    }
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
    if (sess.exists()) {
      val (start, _, cnt) = sess.get()
      sess.clear()
      Iterator.single((key, Math.floorDiv(start, 1000000L), cnt))
    } else Iterator.empty
  }
}
