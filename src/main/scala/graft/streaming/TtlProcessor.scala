package graft.streaming

import graft.transform.ArbitraryStatefulProcessor
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/**
 * State-TTL demonstration processor: per key, TWO ValueStates updated
 * identically — `recent` carries a processing-time TTL (`ttlMs`), `ever`
 * carries [[TTLConfig.NONE]] — and each emission reports whether each
 * state still existed when the key's next row arrived. The contrast is
 * the point: after an idle gap longer than the TTL, `recent` has been
 * expired by the store while `ever` survives.
 *
 * This is the state-size lever for 100 TB streams keyed by an unbounded
 * id space (users, documents, sessions): without a TTL (or explicit
 * timer-driven cleanup, q84's shape) per-key state accumulates forever;
 * with one, the store self-prunes cold keys and its size tracks the
 * ACTIVE key set. TTL requires [[TimeMode.ProcessingTime]] and expiry is
 * wall-clock — results depend on arrival timing BY DESIGN, so this
 * surface is exercised by a restart-gap test (StreamingSpec), not a
 * hash-graded oracle query.
 *
 * Properties: `keyField` (default `user_id`), `valueField` (default
 * `event_id`), `ttlMs` (default 500).
 */
class TtlSeenProcessor extends ArbitraryStatefulProcessor {
  private var keyField = "user_id"
  private var valueField = "event_id"
  private var ttlMs = 500L

  override def init(properties: Map[String, String]): Unit = {
    properties.get("keyField").foreach(keyField = _)
    properties.get("valueField").foreach(valueField = _)
    properties.get("ttlMs").foreach(v => ttlMs = v.toLong)
    require(ttlMs > 0, s"TtlSeenProcessor: ttlMs must be > 0, got $ttlMs")
  }

  override def transformState(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    TwsSupport.ensureRocksDb(spark)
    val typed = df.select(col(keyField).cast("long"), col(valueField).cast("long"))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .transformWithState(new TtlSeenStateMachine(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF(keyField, valueField, "recent_existed", "ever_existed")
  }
}

/** The state machine behind [[TtlSeenProcessor]]. */
class TtlSeenStateMachine(ttlMs: Long)
  extends StatefulProcessor[Long, (Long, Long), (Long, Long, Boolean, Boolean)] {

  @transient private var recent: ValueState[Long] = _
  @transient private var ever: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getValueState[Long]("recent", Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    ever = getHandle.getValueState[Long]("ever", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues): Iterator[(Long, Long, Boolean, Boolean)] = {
    rows.map { case (k, v) =>
      val out = (k, v, recent.exists(), ever.exists())
      recent.update(v)
      ever.update(v)
      out
    }
  }
}

/**
 * Event-time TTL: the deterministic analogue of [[TtlSeenProcessor]]'s
 * wall-clock TTL, built from q84-style event-time timers so the TTL
 * POLICY itself is oracle-checkable. Per key, state remembers the max
 * event time seen; every batch re-arms one timer at `lastSeen + ttl`,
 * and when the WATERMARK passes it without a newer event the key's
 * state is expired and an expiry record (key, last_seen_s) is emitted —
 * expiry is a pure function of the DATA (event times + watermark
 * delay), not of arrival timing, which is exactly what the
 * processing-time TTLConfig cannot give (it requires
 * TimeMode.ProcessingTime, where expiry depends on the wall clock; see
 * TtlSeenProcessor's scaladoc). At 100 TB this is the auditable
 * retention shape: "state for keys idle longer than T is gone" becomes
 * a provable statement about event time, not a hope about scheduling.
 *
 * Properties: `keyField` (default `user_id`), `tsField` (default `ts`),
 * `ttlSeconds` (default 21600). Requires a watermark on the input view.
 */
class EventTtlProcessor extends ArbitraryStatefulProcessor {
  private var keyField = "user_id"
  private var tsField = "ts"
  private var ttlSec = 21600L

  override def init(properties: Map[String, String]): Unit = {
    properties.get("keyField").foreach(keyField = _)
    properties.get("tsField").foreach(tsField = _)
    properties.get("ttlSeconds").foreach(v => ttlSec = v.toLong)
    require(ttlSec > 0, s"EventTtlProcessor: ttlSeconds must be > 0, got $ttlSec")
  }

  override def transformState(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    TwsSupport.ensureRocksDb(spark)
    val typed = df
      .select(col(keyField).cast("long"), unix_micros(col(tsField).cast("timestamp")))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .transformWithState(new EventTtlStateMachine(ttlSec * 1000000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
      .toDF(keyField, "last_seen")
  }
}

/** The state machine behind [[EventTtlProcessor]]: ValueState = max event
 *  time (micros); one event-time timer per key at lastSeen + ttl,
 *  re-armed (delete + register) whenever a newer event arrives. Expiry
 *  emits (key, floor(lastSeen in seconds)) and clears the state. */
class EventTtlStateMachine(ttlUs: Long)
  extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {

  @transient private var last: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    last = getHandle.getValueState[Long]("last", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues): Iterator[(Long, Long)] = {
    var mx = if (last.exists()) last.get() else Long.MinValue
    rows.foreach { case (_, ts) => if (ts > mx) mx = ts }
    if (mx != Long.MinValue) {
      last.update(mx)
      val it = getHandle.listTimers()
      while (it.hasNext) getHandle.deleteTimer(it.next())
      getHandle.registerTimer(Math.floorDiv(mx + ttlUs, 1000L))
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[(Long, Long)] = {
    if (last.exists()) {
      val seen = last.get()
      last.clear()
      Iterator.single((key, Math.floorDiv(seen, 1000000L)))
    } else Iterator.empty
  }
}
