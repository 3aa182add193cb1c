package graft.ml

import graft.ml.Similarity.dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding-space clustering for dataset curation (diversity sampling,
 * balancing, stratified dedup): Lloyd's k-means with deterministic,
 * cross-engine-reproducible arithmetic.
 *
 * Determinism choices (each one matters for bit-reproducibility):
 *  - seeding: the k vectors with the smallest md5(id) — a reproducible
 *    pseudo-random sample, no RNG;
 *  - assignment: argmin of `(v·v + c·c) - 2·(v·c)` with ties broken on the
 *    centroid rank; dot products accumulate left-to-right in double;
 *  - centroid update: per-dimension means over 1e-6-QUANTIZED values —
 *    `Σ round(v_d·1e6)` is an exact integer sum (order-independent,
 *    unlike a double sum), divided once in double. Float noise below 1e-6
 *    cannot perturb centroids, so assignments are a pure function of the
 *    input in ANY engine/partitioning.
 *
 * Scale shape: vectors are scanned once per iteration against broadcast
 * centroids; map-side min_by collapses the k candidates per vector before
 * the exchange, so each assignment shuffles one row per vector and the
 * centroid update shuffles k groups. Centroids are tiny (k × dim doubles)
 * and checkpointed per iteration to keep the plan linear.
 */
object Clustering {

  /** (id, cluster) assignment after `iterations` Lloyd updates of
   *  md5-seeded centroids (assignment uses the final centroids). */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, dim: Int,
             k: Int = 8, iterations: Int = 3): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("vv", dot(col("v"), col("v")))
      .localCheckpoint(true) // scanned once per iteration
    val seeded = v.withColumn("h", Hashing.oracleHash(col("id").cast("string")))
    var cents = seeded.orderBy(col("h"), col("id")).limit(k)
      .withColumn("crank", row_number().over(Window.orderBy(col("h"), col("id"))))
      .select(col("crank"), col("v").as("cv"), col("vv").as("cc"))
      .localCheckpoint(true)

    // Assignment is IN-ROW (r17): the k centroids ride one broadcast
    // 1-row array and each vector picks its cluster by the codegen'd
    // CellArgmin loop — ivfAssignments' routing device. The previous
    // min_by-over-crossJoin form was already map-side, but it still
    // expanded every row k-fold and paid a groupBy(id) exchange PER
    // ITERATION just to undo the expansion; in-row assignment is a pure
    // projection — the only shuffle left per iteration is the k-group
    // centroid update (guide §2.4). Distance expression (left-to-right
    // double dot, vv + cc - 2·dot) and (dist, crank) tie-break are the
    // min_by's exactly — assignments stay bit-identical (oracle-gated).
    def assign(cs: DataFrame): DataFrame = {
      val centArr = cs.agg(
        expr("array_sort(collect_list(struct(crank, cv, cc)))").as("cents"))
      // crossJoin allowlisted: 1-row broadcast centroid-array frame
      v.crossJoin(broadcast(centArr))
        .select(col("id"), col("v"), graft.functions.VectorExpressions
          .cellArgmin(col("v"), col("vv"), col("cents")).as("crank"))
    }

    (1 to iterations).foreach { _ =>
      val assigned = assign(cents)
      // exact integer sums of quantized components -> one double division
      val dims = (1 to dim).map { d =>
        (sum(round(element_at(col("v"), d) * lit(1000000.0)).cast("long")).cast("double")
          / (count(lit(1)).cast("double") * lit(1000000.0))).as(s"d$d")
      }
      val updated = assigned.groupBy(col("crank")).agg(dims.head, dims.tail: _*)
      cents = updated
        .select(col("crank"), array((1 to dim).map(d => col(s"d$d")): _*).as("cv"))
        .withColumn("cc", dot(col("cv"), col("cv")))
        // LAZY cut (r17): k rows — re-roots the per-iteration plan, but
        // all iterations materialize inside the final action's one job
        // instead of one blocking driver-synchronized job per iteration
        // (clusterLabels' measured ~40%-for-4-rounds rationale)
        .localCheckpoint(false)
    }
    assign(cents).select(col("id"), col("crank").cast("int").as("cluster"))
  }
}
