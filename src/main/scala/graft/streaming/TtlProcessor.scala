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
