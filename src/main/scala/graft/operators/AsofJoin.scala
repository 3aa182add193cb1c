package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalable as-of join: for each left row, the latest right row within
 * `[left.ts - tolerance, left.ts]` for the same key.
 *
 * The naive formulation (`JOIN ... ON r.ts BETWEEN l.ts - tol AND l.ts`,
 * reference dialect: scripts/stream-user-train.sql:24) plans as an
 * equi-join on the key with a range residual — fine when few rows share a
 * key, but one hot key degrades to a per-key cartesian at 100 TB.
 *
 * This implementation buckets time into `tolerance`-sized cells and
 * replicates each RIGHT row into the 2 cells whose left timestamps could
 * match it ([floor(rt/tol), floor(rt/tol)+1]); the join becomes a pure
 * equi-join on (key, cell) — shuffle-partitionable, AQE-skew-splittable,
 * with per-pair work bounded by cell population rather than key
 * population. The residual BETWEEN filter then exacts the window, and a
 * max(struct) per left row picks the latest match (latest ts, then
 * highest tie-break column value — deterministic).
 */
object AsofJoin {

  /**
   * @param left      left frame
   * @param right     right frame
   * @param keyCols   equi keys present in both frames
   * @param leftTs    left event-time column (timestamp)
   * @param rightTs   right event-time column (timestamp)
   * @param tolerance look-back window, e.g. "INTERVAL 1 HOUR" seconds
   * @param rightPayload right columns to carry (renamed as-is into output)
   * @return left rows (all columns) + matched right payload (+ `__asof_ts`),
   *         inner semantics (unmatched left rows dropped; use `leftOuter`
   *         for keep-all)
   */
  def latestWithin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String, toleranceSec: Long,
                   rightPayload: Seq[String], leftOuter: Boolean = false): DataFrame = {
    require(toleranceSec > 0, "toleranceSec must be positive")
    val cell = lit(toleranceSec)
    // floor (not long-cast truncation): pre-1970 timestamps have negative
    // epoch seconds, and truncation toward zero would mis-bucket them
    def cellOf(ts: Column): Column = floor(ts.cast("long") / cell).cast("long")
    // surrogate key: identifies each left row exactly, so the groupBy and
    // the leftOuter re-join are null-safe (joining on all left columns
    // would lose rows with NULLs — NULL never equi-matches itself).
    // leftOuter references l0 on BOTH sides of the final join; the id is
    // order-dependent, so pin it with a checkpoint — two independent
    // re-evaluations (e.g. after a shuffle upstream) could disagree.
    val l00 = left.withColumn("__lid_", monotonically_increasing_id())
    val l0 = if (leftOuter) l00.localCheckpoint() else l00
    val l = l0.withColumn("__cell_", cellOf(col(leftTs)))
    // right replicated into the two cells a matching left could occupy
    val r0 = right.select(
      (keyCols.map(col) :+ col(rightTs).as("__rts_")) ++ rightPayload.map(col): _*)
    val r = r0.withColumn("__rc_", cellOf(col("__rts_")))
      .withColumn("__cell_", explode(array(col("__rc_"), col("__rc_") + 1)))
      .drop("__rc_")
    val joined = l.join(r, keyCols :+ "__cell_", "inner")
      .filter(col("__rts_") >= col(leftTs) - expr(s"INTERVAL $toleranceSec SECONDS")
        && col("__rts_") <= col(leftTs))
    // latest right row per left row: max over (rts, payload...) struct
    val leftCols = left.columns.map(col).toSeq
    val pick = max(struct((col("__rts_") +: rightPayload.map(col)): _*)).as("__best_")
    val best = joined.groupBy(col("__lid_") +: leftCols: _*).agg(pick)
    val withPayload = best.select(
      (col("__lid_") +: leftCols :+ col("__best_.__rts_").as("__asof_ts"))
        ++ rightPayload.map(p => col(s"__best_.$p").as(p)): _*)
    if (!leftOuter) withPayload.drop("__lid_")
    else l0.join(withPayload.select(
        (col("__lid_") +: col("__asof_ts") +: rightPayload.map(col)): _*),
      Seq("__lid_"), "left").drop("__lid_")
  }
}
