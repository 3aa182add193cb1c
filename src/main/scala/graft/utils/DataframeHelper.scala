package graft.utils

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Frame utilities mirrored from the reference's utils/DataframeHelper.scala.
 */
object DataframeHelper {

  /**
   * Split a DataFrame into chunks of at most `numPartitions` partitions each,
   * for bounded-concurrency sink writes (reference: DataframeHelper.scala:21-29
   * — `spark_partition_id / n` bucketing + filter; used by JdbcWriter to cap
   * open connections at `ioConnections`).
   */
  def split(df: DataFrame, numPartitions: Int): Seq[DataFrame] = {
    val total = df.rdd.getNumPartitions
    if (total <= numPartitions) Seq(df)
    else {
      val chunks = (total + numPartitions - 1) / numPartitions
      val withBucket = df.withColumn("__bucket_", spark_partition_id() % chunks)
      (0 until chunks).map(b => withBucket.filter(col("__bucket_") === b).drop("__bucket_"))
    }
  }

  /**
   * Row numbering (reference: DataframeHelper.scala:33-59).
   *  - with partition columns: `row_number over (partition by cols order by
   *    monotonically_increasing_id)` (:38);
   *  - global: per-partition counts + running-sum offsets joined back, so no
   *    single-partition shuffle of the whole data — scales to arbitrary row
   *    counts unlike a global `row_number() over (order by ...)` (:41-58).
   */
  /**
   * Skew-safe equi-join: when one join key carries a disproportionate share
   * of the probe-side rows, a plain shuffle join lands that key's whole
   * population on one reduce task. Salting spreads it: the probe (left)
   * side gets a deterministic salt in [0, salt), the build (right) side is
   * replicated once per salt value, and the join runs on (keys, salt) —
   * each hot key now occupies `salt` tasks. Build-side cost: ×salt rows
   * (use for small-to-medium build sides; for dimension-sized builds prefer
   * `broadcast`; AQE's skew-join split handles the sort-merge case — this
   * covers plans AQE can't rewrite, e.g. when the skew is in an
   * aggregation feeding the join).
   *
   * Supports inner and left joins (right-side replication preserves both).
   *
   * With `spreadDuplicates` the partition id joins the hash input, so exact
   * duplicate rows of a hot key living in different partitions spread too
   * (the worst skew shape: many identical rows). Retry-safe — a recomputed
   * map task has the same partition index, so it re-derives the same salt —
   * and join-correct regardless: the right side carries every salt value,
   * so ANY salt in [0, salt) matches. Identical duplicates within ONE
   * partition still co-locate; that residual is bounded by rows-per-
   * partition, not by the hot key's total population.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner",
                 spreadDuplicates: Boolean = false): DataFrame = {
    require(salt > 1, "salt must be > 1")
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, got $joinType")
    // deterministic spread: hash of the row's content, not rand() or
    // monotonically_increasing_id (both vary across recomputations /
    // indeterminate stage retries) — the salt is a pure function of the
    // row, so re-evaluation re-derives the same bucket. Map-typed columns
    // are excluded from the hash input (hash() rejects maps — their
    // iteration order is undefined); rows differing only in a map column
    // co-locate, like exact duplicates do without `spreadDuplicates`.
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case ArrayType(et, _) => containsMap(et)
      case StructType(fs) => fs.exists(f => containsMap(f.dataType))
      case _ => false
    }
    val hashable = left.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    val saltInput = (if (spreadDuplicates) hashable :+ spark_partition_id() else hashable) match {
      case empty if empty.isEmpty => IndexedSeq(spark_partition_id()) // all-map row: partition spread only
      case cols => cols
    }
    val l = left.withColumn("__salt_", pmod(hash(saltInput: _*), lit(salt)))
    val r = right.withColumn("__salt_", explode(array((0 until salt).map(lit): _*)))
    l.join(r, keys :+ "__salt_", joinType).drop("__salt_")
  }

  /**
   * Skew-aware join: salt ONLY the hot keys. [[saltedJoin]] replicates
   * the ENTIRE right side `salt`× — correct, but at 100 TB that is
   * salt×|R| extra shuffle volume when the skew is usually confined to
   * a handful of keys. This variant measures per-key left-side counts
   * with one map-side-combined aggregate (output is |distinct keys|
   * rows; the hot set — count > hotThreshold — has at most
   * |L|/hotThreshold keys, tiny by construction), broadcasts the hot
   * key set, and splits BOTH sides on it: hot rows ride [[saltedJoin]]
   * (each giant key group spread over `salt` tasks, only the hot slice
   * of the right side replicated), cold rows ride a plain equi join.
   * The union of the two legs is row-identical to the plain join —
   * the split predicate is a pure function of the join key, so every
   * matching pair lands in exactly one leg.
   *
   * vs AQE skew handling: AQE splits oversized PARTITIONS of a
   * sort-merge join at runtime, but a single giant KEY group is
   * indivisible to it — all its rows still hash to one task. Salting
   * splits the key itself, which is the only cure when one key is a
   * double-digit percentage of the corpus (null-like sentinel ids,
   * empty-string URLs, the "unknown" language bucket).
   *
   * Input reuse: `left` is referenced three times (hot-count aggregate +
   * the two leg splits) and `right` twice. The hot-set broadcast itself
   * is built ONCE — its four join sites share one physical exchange via
   * ReuseExchange — but the leg splits do re-scan the inputs. Against a
   * columnar source that is usually the RIGHT default at 100 TB: the
   * aggregate scan prunes to the key columns, and a full materialization
   * of a 100 TB input costs more than the extra scan it saves. When the
   * input is NOT a cheap re-scan (an expensive upstream transform, an
   * exploded frame), pass `reuseInputs = true` to persist both sides
   * (MEMORY_AND_DISK, serialized). The CALLER owns the unpersist: the
   * cached blocks stay registered after the join result is consumed
   * (call `left.unpersist()` / `right.unpersist()` on the frames you
   * passed in, or let the session's ContextCleaner reclaim them when
   * the frames go out of scope) — or pre-`.persist()` them yourself
   * for control over level and unpersist timing.
   */
  def skewAwareJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                    salt: Int = 8, hotThreshold: Long = 100000L,
                    joinType: String = "inner",
                    reuseInputs: Boolean = false): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be > 0")
    val (l, r) =
      if (reuseInputs)
        (left.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER),
          right.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
      else (left, right)
    skewAwareJoinImpl(l, r, keys, salt, hotThreshold, joinType)
  }

  private def skewAwareJoinImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                                salt: Int, hotThreshold: Long,
                                joinType: String): DataFrame = {
    // joinType domain is checked by saltedJoin (inner/left only: a right/
    // full join would need the split on the right side's counts too)
    val hot = broadcast(
      left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cnt_"))
        .filter(col("__cnt_") > hotThreshold)
        .select(keys.map(col): _*))
    val hotLeg = saltedJoin(
      left.join(hot, keys, "left_semi"),
      right.join(hot, keys, "left_semi"), keys, salt, joinType)
    val coldLeg = left.join(hot, keys, "left_anti")
      .join(right.join(hot, keys, "left_anti"), keys, joinType)
    hotLeg.unionByName(coldLeg)
  }

  /**
   * Dense 1-based sequence number within each group, in `orderCols` order,
   * WITHOUT a per-group window — the scale form of
   * `row_number() OVER (PARTITION BY group ORDER BY order)` for COARSE
   * groups. A per-group window puts each whole group in one task; with 8
   * length buckets over a 100 TB corpus that is 8 corpus-sized sort
   * tasks. Here the corpus range-sorts on (group, order) across ALL
   * tasks, local ranks ride a partition-id window (key count = task
   * count, every task bounded), partition offsets are a task-count-sized
   * broadcast, and each group's min global index is a groups-sized
   * broadcast — `seq = global_idx - group_min + 1`. Output is bit-equal
   * to the window form whenever (groupCols ++ orderCols) is unique per
   * row (ties make ANY row_number nondeterministic — pass a key tail).
   * Groups must be broadcastable (one row each); tasks pay one extra
   * pid-keyed exchange vs the window form — linear, never a giant task.
   */
  def perGroupSequence(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                       seqCol: String): DataFrame = {
    require(groupCols.nonEmpty && orderCols.nonEmpty,
      "perGroupSequence needs group and order columns")
    val sortCols = (groupCols ++ orderCols).map(col)
    // The pid-stamped sorted frame feeds TWO consumers (ranks + offsets);
    // without pinning, each consumer RECOMPUTES it, and a nondeterministic
    // upstream (round-robin repartition, sampling-dependent range bounds)
    // can land rows on different pids per recomputation — offsets then
    // describe a different partitioning than the ranks. localCheckpoint
    // materializes the sorted frame once (lazy: on first use).
    val base = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid_", spark_partition_id())
      .localCheckpoint(false)
    val wInPart = Window.partitionBy(col("__pid_")).orderBy(sortCols: _*)
    val rn = base.withColumn("__rn_", row_number().over(wInPart).cast("long"))
    val offsets = rn.groupBy(col("__pid_")).agg(count(lit(1)).as("__cnt_"))
      .withColumn("__offset_",
        coalesce(sum(col("__cnt_")).over(Window.orderBy(col("__pid_"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid_"), col("__offset_"))
    val idx = rn.join(broadcast(offsets), "__pid_")
      .withColumn("__idx_", col("__offset_") + col("__rn_"))
    val gmin = idx.groupBy(groupCols.map(col): _*).agg(min(col("__idx_")).as("__gmin_"))
    idx.join(broadcast(gmin), groupCols)
      .withColumn(seqCol, col("__idx_") - col("__gmin_") + lit(1L))
      .drop("__pid_", "__rn_", "__offset_", "__idx_", "__gmin_")
  }

  /**
   * Per-group RUNNING SUM of `valueCol` in `orderCols` order — the scale
   * form of `sum(v) OVER (PARTITION BY g ORDER BY o ROWS UNBOUNDED
   * PRECEDING)` for coarse groups, built on [[perGroupSequence]]'s
   * machinery: range-sort on (group, order), within-(pid, group) running
   * sums (bounded tasks), and a (pid × group)-sized offsets frame whose
   * own prefix sums ride a tiny per-group window. Same contracts:
   * (groupCols ++ orderCols) unique per row, groups broadcastable.
   * Sums carry Spark's native sum result type: integral and decimal
   * valueCols are BIT-EQUAL to the window form; float/double sums are
   * numerically equivalent but may differ in final ulps (the segmented
   * summation order differs from the window's strict left fold).
   * The prefix-sum selection pattern (token-budget corpus cuts,
   * quota-fill) runs on exactly this shape at 100 TB — a global ORDER BY
   * running sum is one task holding the corpus.
   */
  def perGroupRunningSum(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                         valueCol: String, sumCol: String): DataFrame = {
    require(groupCols.nonEmpty && orderCols.nonEmpty,
      "perGroupRunningSum needs group and order columns")
    val sortCols = (groupCols ++ orderCols).map(col)
    // pinned for the same two-consumer reason as perGroupSequence
    val base = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid_", spark_partition_id())
      .localCheckpoint(false)
    val wRun = Window.partitionBy((col("__pid_") +: groupCols.map(col)): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Sums keep Spark's NATIVE sum result type end-to-end (long for
    // integral, double for double, widened decimal for decimal) — a
    // per-segment cast would truncate fractional partials and break the
    // window-form equivalence for non-integral valueCols.
    val local = base.withColumn("__run_", sum(col(valueCol)).over(wRun))
    // (pid, group) totals: one row per task per group it touches — the
    // per-group prefix over pid order is a window over this TINY frame
    val wOff = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__pid_"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy((col("__pid_") +: groupCols.map(col)): _*)
      .agg(sum(col(valueCol)).as("__tot_"))
      .withColumn("__offset_", coalesce(sum(col("__tot_")).over(wOff), lit(0L)))
      .select((col("__pid_") +: groupCols.map(col)) :+ col("__offset_"): _*)
    local.join(broadcast(offsets), "__pid_" +: groupCols)
      .withColumn(sumCol, col("__offset_") + col("__run_"))
      .drop("__pid_", "__run_", "__offset_")
  }

  def zipWithIndex(df: DataFrame, indexCol: String, partitionCols: Seq[String] = Seq.empty): DataFrame =
    if (partitionCols.nonEmpty) {
      val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(monotonically_increasing_id())
      df.withColumn(indexCol, row_number().over(w).cast("long"))
    } else {
      // offsets: tiny frame (one row per input partition, i.e. bounded by
      // cluster parallelism not data volume) — the partitionless window
      // over it is cheap and allowlisted in the PlanSpec guard
      val withPid = df.withColumn("__pid_", spark_partition_id())
      val offsets = withPid.groupBy(col("__pid_")).agg(count(lit(1)).as("__cnt_"))
        .withColumn("__offset_",
          coalesce(sum(col("__cnt_")).over(Window.orderBy(col("__pid_"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("__pid_"), col("__offset_"))
      val wInPart = Window.partitionBy(col("__pid_")).orderBy(monotonically_increasing_id())
      withPid.withColumn("__rn_", row_number().over(wInPart).cast("long"))
        .join(broadcast(offsets), "__pid_")
        .withColumn(indexCol, col("__offset_") + col("__rn_"))
        .drop("__pid_", "__rn_", "__offset_")
    }
}

/**
 * Repartition a named view to N partitions, optionally by columns
 * (reference: utils/ViewPartitioner.scala:28-39).
 */
class ViewPartitioner extends Actor {
  private var view: String = ""
  private var numPartitions: Int = 0
  private var partitionBy: Seq[String] = Seq.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    view = require_(properties, "view")
    numPartitions = require_(properties, "numPartitions").toInt
    properties.get("partitionBy").foreach(p => partitionBy = p.split(",").map(_.trim).toSeq)
  }
  def viewName(v: String): this.type = { view = v; this }
  def partitions(n: Int): this.type = { numPartitions = n; this }
  def partitionedBy(cols: String*): this.type = { partitionBy = cols; this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    Some(
      if (partitionBy.nonEmpty) df.repartition(numPartitions, partitionBy.map(df.col): _*)
      else df.repartition(numPartitions))
  }
}
