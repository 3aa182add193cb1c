package graft.streaming

import graft.transform.ArbitraryStatefulProcessor
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Shared transformWithState session plumbing. */
private[streaming] object TwsSupport {
  /** transformWithState requires the RocksDB state-store provider. Only
   *  default it when the session hasn't configured one — and note the
   *  session-level effect: later streaming queries in this session
   *  inherit it (a per-query provider is not settable; checkpoints
   *  created under a different provider must not be resumed after). */
  def ensureRocksDb(spark: SparkSession): Unit = {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    if (spark.conf.getOption(confKey).forall(_.trim.isEmpty)
        || spark.conf.getOption(confKey).exists(_.endsWith("HDFSBackedStateStoreProvider")))
      spark.conf.set(confKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  }
}

/**
 * Per-key rolling profile through transformWithState's FULL typed-state
 * surface — ListState (the k earliest events), MapState (per-type
 * counters), ValueState (total count) — the per-entity feature
 * accumulator a clickstream curation pipeline keeps per user/document.
 *
 * Every piece of state is an ORDER-FREE merge: the first-k list is a
 * bottom-k union-then-trim on (ts, event_id) (c7's invariance contract
 * applied to typed state), the type counters and total are additive —
 * so micro-batch slicing cannot change the final emission, and the
 * drained last-emission-per-key equals the batch computation exactly
 * (StreamingSpec proves this with a forced 2-batch replay).
 *
 * Properties: `keyField`/`tsField`/`idField`/`typeField`, `k`
 * (first-k size, default 3). Output: (key, first_types, type_counts,
 * n_seen) — strings are canonical (event order / sorted type order),
 * so they hash-compare across engines.
 */
class UserProfileProcessor extends ArbitraryStatefulProcessor {
  private var keyField = "user_id"
  private var tsField = "ts"
  private var idField = "event_id"
  private var typeField = "event_type"
  private var k = 3

  override def init(properties: Map[String, String]): Unit = {
    properties.get("keyField").foreach(keyField = _)
    properties.get("tsField").foreach(tsField = _)
    properties.get("idField").foreach(idField = _)
    properties.get("typeField").foreach(typeField = _)
    properties.get("k").foreach(v => k = v.toInt)
    require(k >= 1, s"UserProfileProcessor: k must be >= 1, got $k")
  }

  override def transformState(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    TwsSupport.ensureRocksDb(spark)
    val typed = df
      .select(col(keyField).cast("long"), unix_micros(col(tsField).cast("timestamp")),
        col(idField).cast("long"), col(typeField).cast("string"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .transformWithState(new ProfileStateMachine(k), TimeMode.None(), OutputMode.Append())
      .toDF(keyField, "first_types", "type_counts", "n_seen")
  }
}

/** The typed state machine behind [[UserProfileProcessor]]. Emits the
 *  key's CURRENT profile once per batch it appears in; downstream takes
 *  the last emission per key (exact because every merge is order-free). */
class ProfileStateMachine(k: Int)
  extends StatefulProcessor[Long, (Long, Long, Long, String), (Long, String, String, Long)] {

  @transient private var firstK: ListState[(Long, Long, String)] = _
  @transient private var typeCounts: MapState[String, Long] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    firstK = getHandle.getListState[(Long, Long, String)](
      "first_k", Encoders.product[(Long, Long, String)], TTLConfig.NONE)
    typeCounts = getHandle.getMapState[String, Long](
      "type_counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long, String)],
                               timerValues: TimerValues): Iterator[(Long, String, String, Long)] = {
    val batch = rows.toArray
    // bottom-k union-then-trim: idempotent and order-free, so the stored
    // list is the same whatever batch sliced these events apart
    val merged = (firstK.get().toArray ++ batch.map(r => (r._2, r._3, r._4)))
      .sortBy(t => (t._1, t._2)).take(k)
    firstK.put(merged)
    batch.foreach { r =>
      val t = r._4
      val cur = if (typeCounts.containsKey(t)) typeCounts.getValue(t) else 0L
      typeCounts.updateValue(t, cur + 1L)
    }
    val total = (if (seen.exists()) seen.get() else 0L) + batch.length
    seen.update(total)
    val firstStr = merged.map(_._3).mkString(",")
    val countsStr = typeCounts.iterator().toArray.sortBy(_._1)
      .map { case (t, c) => s"$t:$c" }.mkString(",")
    Iterator.single((key, firstStr, countsStr, total))
  }
}
