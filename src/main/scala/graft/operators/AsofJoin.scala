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
    // left cell
    val l = left.withColumn("__cell_", (col(leftTs).cast("long") / cell).cast("long"))
    // right replicated into the two cells a matching left could occupy
    val r0 = right.select(
      (keyCols.map(col) :+ col(rightTs).as("__rts_")) ++ rightPayload.map(col): _*)
    val r = r0.withColumn("__rc_", (col("__rts_").cast("long") / cell).cast("long"))
      .withColumn("__cell_", explode(array(col("__rc_"), col("__rc_") + 1)))
      .drop("__rc_")
    val joined = l.join(r, keyCols :+ "__cell_", "inner")
      .filter(col("__rts_") >= col(leftTs) - expr(s"INTERVAL $toleranceSec SECONDS")
        && col("__rts_") <= col(leftTs))
    // latest right row per left row: max over (rts, payload...) struct
    val leftCols = left.columns.map(col).toSeq
    val pick = max(struct((col("__rts_") +: rightPayload.map(col)): _*)).as("__best_")
    // one cell per left row, so left columns alone identify it (callers
    // should include a unique id; identical duplicate left rows merge)
    val best = joined.groupBy(leftCols: _*).agg(pick)
    val withPayload = best.select(
      (leftCols :+ col("__best_.__rts_").as("__asof_ts"))
        ++ rightPayload.map(p => col(s"__best_.$p").as(p)): _*)
    if (!leftOuter) withPayload
    else left.join(withPayload,
      left.columns.toSeq, "left")
  }
}
