package graft.ml

import org.apache.spark.sql.DataFrame

/**
 * Dynamic-scope registry for the INTERIOR `persist()` calls the ml
 * maintenance passes create ([[Similarity.ivfMaintain]]/`ivfMerge`/
 * `ivfRebalance`'s assignment caches, [[Dedup.cdcClean]]/`chunkDedup`/
 * `boilerplateStrip`'s shared scan frames). Those caches exist because a
 * pass has several consumers of one corpus-scale frame; but the RETURNED
 * DataFrames depend on the cached plans, so the pass itself can never
 * free them — and a long-lived session invoking maintenance per ingest
 * cycle would otherwise accumulate corpus-sized storage blocks until
 * eviction/GC stalls (the r13 bench failure mode).
 *
 * Ownership contract:
 *  - LIBRARY callers own the storage: wrap the call in [[collect]] and
 *    unpersist the returned frames once the outputs are materialized
 *    (written, collected, checkpointed). Unpersisting only drops the
 *    cache — results are unaffected, later consumers just recompute.
 *  - The ACTOR surface does this automatically: every ml actor collects
 *    its pass's caches and defers them to the JobContext, whose job-end
 *    `cleanup()` (after writers ran) frees them — MlSpec pins that a
 *    pipeline running `ivf-maintain` / `cdc-clean` leaves ZERO persistent
 *    RDDs behind.
 *  - Outside any [[collect]] scope the behavior is unchanged (the cache
 *    is simply never freed by the library); Bench drops all storage
 *    between queries, so catalog timings are unaffected either way.
 *
 * The registry is a plain ThreadLocal: `persist()` runs at PLAN-BUILD
 * time on the driver thread that invoked the pass, never inside a task,
 * so dynamic scoping is sound (and nested collects register into the
 * innermost scope only).
 */
object CacheLease {
  private val scopes =
    new ThreadLocal[List[collection.mutable.ListBuffer[DataFrame]]] {
      override def initialValue: List[collection.mutable.ListBuffer[DataFrame]] = Nil
    }

  /** Run `body`, returning its result plus every frame an ml pass
   *  persisted while it ran on this thread. The caller owns those
   *  frames' storage: unpersist them after materializing the result. */
  def collect[A](body: => A): (A, Seq[DataFrame]) = {
    val buf = collection.mutable.ListBuffer.empty[DataFrame]
    scopes.set(buf :: scopes.get)
    val out =
      try body
      finally scopes.set(scopes.get.tail)
    (out, buf.toList)
  }

  /** persist() + register with the innermost collect scope (no-op
   *  registration when none is installed). */
  private[ml] def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    scopes.get.headOption.foreach(_ += p)
    p
  }
}
