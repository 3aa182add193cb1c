package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Brute-force cosine top-k is the exact baseline; the scale path is
 * LSH-bucketed search (random-hyperplane sign bits) which turns the
 * quadratic all-pairs join into a keyed join on bucket ids. Both are pure
 * DataFrame plans: the dot product is `aggregate(zip_with(...))` — codegen'd
 * Catalyst expressions, no UDFs, no driver collects.
 */
object Similarity {

  /** Double-precision dot product of two float-array columns, accumulated
   *  left-to-right (deterministic, engine-reproducible). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /**
   * Exact brute-force top-k cosine neighbors of `queries` within `corpus`.
   * Cross join pruned per-query by rank window. At scale the corpus side
   * should be broadcast when small, or bucketed (see [[lshBuckets]]); the
   * cross join is the exact-oracle baseline.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    // round before ranking so float last-ulp noise cannot flip the order;
    // neighbor_id breaks exact ties deterministically
    val ranked = scored
      .withColumn("cos_r", round(col("cos_sim"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos_r").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
    ranked.select(col("query_id"), col("neighbor_id"),
      col("cos_r").cast("decimal(10,6)").as("cos_sim"), col("rank"))
  }

  /**
   * Random-hyperplane LSH bucket id: sign bits of `numPlanes` deterministic
   * pseudo-random hyperplanes. Plane component (p, d) is derived from an
   * md5-seeded value in [-0.5, 0.5) — fully deterministic, no RNG state.
   * Vectors in the same bucket are near-duplicates candidates; probing only
   * the query's bucket makes search cost ~corpus/2^numPlanes per query.
   */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = (0 until dim).map { d =>
        val seed = Hashing.oracleHash(lit(s"plane:$p:$d"))
        // map 60-bit hash to [-0.5, 0.5)
        val w = seed.cast("double") / lit(math.pow(2, 60)) - lit(0.5)
        element_at(vec, d + 1).cast("double") * w
      }.reduce(_ + _)
      when(proj > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, dim: Int, numPlanes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), dim, numPlanes).as("bucket"))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), dim, numPlanes).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos_sim"))
    scored
      .withColumn("cos_r", round(col("cos_sim"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos_r").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_r").cast("decimal(10,6)").as("cos_sim"), col("rank"))
  }

  /**
   * Embedding-cosine near-duplicate pairs, blocked by a coarse key (e.g. a
   * label/cluster column) so the pair join never goes quadratic in the
   * corpus. Output: (id_a < id_b, cos_sim) with cos ≥ threshold.
   */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, blockCol: String,
                   threshold: Double): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"), col(blockCol).as("blk"))
    v.as("a").join(v.as("b"), col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos_r"))
      .filter(col("cos_r") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_r").cast("decimal(10,6)").as("cos_sim"))
  }
}
