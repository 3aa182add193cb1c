package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>` / `<double>`).
 *
 * Brute-force cosine top-k is the exact baseline; the scale path is
 * LSH-bucketed search (random-hyperplane sign bits) which turns the
 * quadratic all-pairs join into a keyed join on bucket ids. All pure
 * DataFrame plans — no UDFs, no driver collects.
 *
 * Perf: vector norms are computed ONCE per vector before the pair join,
 * not per pair — at k×n pairs that cuts per-pair flops ~3×. The cosine is
 * still assembled as dot/(normA*normB) with left-to-right double
 * accumulation, so results are bit-identical to a per-pair computation
 * (and to the DuckDB oracle's expression).
 */
object Similarity {

  /** Double-precision dot product of two array columns, accumulated
   *  left-to-right (deterministic, engine-reproducible). Backed by the
   *  native codegen'd [[graft.functions.VectorExpressions.ArrayDotProduct]]
   *  — bit-identical to an aggregate(zip_with(...)) fold, ~10× faster. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot(a, b)

  def l2Norm(a: Column): Column = graft.functions.VectorExpressions.l2Norm(a)

  /** Interpreted higher-order-function formulations, kept as the reference
   *  semantics the native expressions must match (see MlSpec parity test). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2NormHof(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /**
   * Known-dimension variants: explicit element_at sums, bit-identical to
   * the fold form (same left-assoc order). NOTE measured slower than the
   * interpreted fold on this build — the 64-term trees blow up janino
   * codegen compile time per stage — so the pair ops default to the fold;
   * these stay for callers with small dims.
   */
  def dotFixed(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  def l2NormFixed(a: Column, dim: Int): Column =
    sqrt((1 to dim).map { i =>
      val x = element_at(a, i).cast("double"); x * x
    }.reduce(_ + _))

  private def dotD(a: Column, b: Column, dim: Option[Int]): Column =
    dim.map(dotFixed(a, b, _)).getOrElse(dot(a, b))
  private def normD(a: Column, dim: Option[Int]): Column =
    dim.map(l2NormFixed(a, _)).getOrElse(l2Norm(a))

  /** (id, v, norm) projection used by the pair joins. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
                       idAs: String, vAs: String, nAs: String, dim: Option[Int]): DataFrame =
    df.select(col(idCol).cast("long").as(idAs), col(vecCol).as(vAs),
      normD(col(vecCol), dim).as(nAs))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("cos_r", round(col("cos_sim"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos_r").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_r").as("cos_sim"), col("rank"))

  /**
   * Exact brute-force top-k cosine neighbors of `queries` within `corpus`.
   * The corpus side of the cross join is broadcast when small; rounding
   * before ranking keeps float last-ulp noise from flipping the order,
   * neighbor_id breaks exact ties.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     dim: Option[Int] = None): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn", dim)
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn", dim)
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotD(col("qv"), col("cv"), dim) / (col("qn") * col("cn"))).as("cos_sim"))
    rankTopK(scored, k)
  }

  /**
   * Hard-negative mining (s13): for each query vector, the top-k most
   * similar corpus vectors with a DIFFERENT label — the negatives a
   * contrastive-training pipeline wants (near the decision boundary,
   * not random). Same determinism contract as [[bruteForceTopK]]:
   * round-6 cosine, neighbor_id tie-break. Output: (query_id,
   * neighbor_id, neg_label, cos_sim, rank).
   *
   * This is the exact O(|Q|·|N|) grading baseline (s1's role); the
   * production twin is [[hardNegativesIvf]] — the IVF cell probe with
   * the same different-label filter applied to the cell candidates.
   */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, labelCol: String, k: Int,
                    dim: Option[Int] = None): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qv"), normD(col(vecCol), dim).as("qn"),
      col(labelCol).cast("string").as("qlabel"))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("cv"), normD(col(vecCol), dim).as("cn"),
      col(labelCol).cast("string").as("nlabel"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("qlabel") =!= col("nlabel"))
      .select(col("query_id"), col("neighbor_id"), col("nlabel").as("neg_label"),
        (dotD(col("qv"), col("cv"), dim) / (col("qn") * col("cn"))).as("cos_sim"))
    scored
      .withColumn("cos_r", round(col("cos_sim"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos_r").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        col("cos_r").as("cos_sim"), col("rank"))
  }

  /**
   * IVF-routed hard-negative mining (s13b) — the production shape of
   * [[hardNegatives]]. Candidate generation is [[ivfTopK]]'s cell probe
   * (each query scans only its `nprobe` nearest of `numCentroids`
   * Voronoi cells), and the different-label predicate is applied as a
   * per-pair FILTER on the cell candidates — never a join key — so it
   * composes with the probe without changing the shuffle shape. Per-query
   * work drops from |corpus| to ~nprobe·|corpus|/numCentroids; the only
   * all-pairs node is the broadcast crossJoin against the k-row centroid
   * frame (the reviewed s3 shape). Approximate by the same argument as
   * IVF top-k: a negative in an unprobed cell is missed — acceptable for
   * contrastive mining, where hard negatives are by definition NEAR the
   * query and therefore land in its nearest cells. Determinism contract
   * and output schema identical to [[hardNegatives]].
   */
  def hardNegativesIvf(queries: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String, labelCol: String, k: Int,
                       numCentroids: Int = 16, nprobe: Int = 2): DataFrame = {
    def withLbl(df: DataFrame): DataFrame =
      df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        dot(col(vecCol), col(vecCol)).as("vv"), col(labelCol).cast("string").as("lbl"))
    val cents = ivfCentroids(corpus, idCol, vecCol, numCentroids)
    val cells = rankCells(withLbl(corpus), cents)
      .filter(col("__arank_") === 1)
      .select(col("crank"), col("id").as("neighbor_id"), col("v").as("cv2"),
        col("vv").as("cvv"), col("lbl").as("nlabel"))
    val queryCells = rankCells(withLbl(queries), cents)
      .filter(col("__arank_") <= nprobe)
      .select(col("crank"), col("id").as("query_id"), col("v").as("qv"),
        col("vv").as("qvv"), col("lbl").as("qlabel"))
    val scored = queryCells.join(cells, Seq("crank"))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("qlabel") =!= col("nlabel"))
      .select(col("query_id"), col("neighbor_id"), col("nlabel").as("neg_label"),
        (dot(col("qv"), col("cv2")) / (sqrt(col("qvv")) * sqrt(col("cvv")))).as("cos_sim"))
    scored
      .withColumn("cos_r", round(col("cos_sim"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos_r").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("neg_label"),
        col("cos_r").as("cos_sim"), col("rank"))
  }

  /**
   * Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
   * SIGIR'98): greedily pick `k` of each query's `poolSize` nearest
   * neighbors, each step taking the candidate maximizing
   * `λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)` — relevance minus
   * redundancy against the already-picked set S. The diversity pass a
   * retrieval pipeline runs after ANN so the k results aren't k copies
   * of one near-dup cluster.
   *
   * Determinism: relevance and redundancy are the round-6 cosines
   * (bruteForceTopK's contract) requantized to integer micro-units, λ is
   * the RATIONAL lambdaNum/lambdaDen, and the score is the all-integer
   * `lambdaNum·rel_µ − (lambdaDen−lambdaNum)·red_µ` (units of
   * 1e-6/lambdaDen) — float λ weights were measured to land scores on
   * exact decimal midpoints (0.7·a − 0.3·b of 6-decimal inputs has 7
   * decimal digits, so round-6 hits x.xxxxxx5 routinely, where Spark's
   * HALF_UP and an oracle engine's binary-exact rounding disagree).
   * Ties break on min neighbor id, so the greedy trace is a pure input
   * function.
   *
   * Scale shape: the pool bounds per-query work — pairwise sims are
   * ≤ poolSize² rows per query and every join afterwards is keyed on
   * query_id; each greedy step is one keyed max-agg + one struct-max
   * argmax (no windows beyond the pool ranking itself).
   */
  def mmrTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int = 3, poolSize: Int = 8,
              lambdaNum: Int = 7, lambdaDen: Int = 10,
              dim: Option[Int] = None,
              semantic: String = "brute", numCentroids: Int = 16,
              nprobe: Int = 2): DataFrame = {
    require(k >= 1 && k <= poolSize, s"mmrTopK: need 1 <= k <= poolSize, got k=$k pool=$poolSize")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"mmrTopK: need 0 <= lambdaNum <= lambdaDen, got $lambdaNum/$lambdaDen")
    require(Seq("brute", "ivf").contains(semantic),
      s"mmrTopK: semantic must be brute|ivf, got $semantic")
    // the pool generator is swappable (s13b's pattern): "brute" is the
    // labeled exact baseline; "ivf" routes each query through its nprobe
    // nearest cells — the production pool build at corpus scale. The MMR
    // re-rank itself is pool-bounded either way (<= poolSize² sims/query).
    val pool = (semantic match {
      case "ivf" => ivfTopK(queries, corpus, idCol, vecCol, poolSize,
        numCentroids, nprobe)
      case _ => bruteForceTopK(queries, corpus, idCol, vecCol, poolSize, dim)
    }).localCheckpoint(false)
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn", dim)
    val pv = pool.select(col("query_id"), col("neighbor_id")).join(c, "neighbor_id")
    val a = pv.select(col("query_id"), col("neighbor_id").as("ida"),
      col("cv").as("va"), col("cn").as("na"))
    val b = pv.select(col("query_id"), col("neighbor_id").as("idb"),
      col("cv").as("vb"), col("cn").as("nb"))
    // integer micro-units: the round-6 cosine times 1e6 is integer-valued;
    // the outer round() only strips float representation error
    def micro(c: Column): Column = round(c * lit(1000000.0)).cast("long")
    val psim = a.join(b, Seq("query_id")).filter(col("ida") =!= col("idb"))
      .select(col("query_id"), col("ida"), col("idb"),
        micro(round(dotD(col("va"), col("vb"), dim) / (col("na") * col("nb")), 6)).as("sim_u"))
      .localCheckpoint(false)
    val rel = pool.select(col("query_id"), col("neighbor_id"),
      micro(col("cos_sim")).as("rel_u"))
    var sel = pool.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("pick_rank"),
        (micro(col("cos_sim")) * lit(lambdaDen.toLong)).as("score_u"))
    for (step <- 2 to k) {
      val selIds = sel.select(col("query_id"), col("neighbor_id").as("sid"))
      val remaining = rel.join(
        selIds.withColumnRenamed("sid", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
      val red = remaining
        .join(psim.withColumnRenamed("ida", "neighbor_id"), Seq("query_id", "neighbor_id"))
        .join(selIds.withColumnRenamed("sid", "idb"), Seq("query_id", "idb"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(max(col("sim_u")).as("red_u"))
      val scored = remaining.join(red, Seq("query_id", "neighbor_id"))
        .withColumn("score_u",
          lit(lambdaNum.toLong) * col("rel_u") -
            lit((lambdaDen - lambdaNum).toLong) * col("red_u"))
      val pick = scored.groupBy(col("query_id"))
        .agg(max(struct(col("score_u"), (-col("neighbor_id")).as("nid"))).as("m"))
        .select(col("query_id"), (-col("m.nid")).as("neighbor_id"),
          lit(step).as("pick_rank"), col("m.score_u").as("score_u"))
      sel = sel.unionByName(pick).localCheckpoint(false)
    }
    // score_u is in units of 1e-6/lambdaDen (step 1 pre-scales by
    // lambdaDen so every step shares one unit)
    sel.select(col("query_id"), col("pick_rank").cast("int").as("pick_rank"),
      col("neighbor_id"), col("score_u"))
  }

  /**
   * Hybrid retrieval with Reciprocal Rank Fusion (Cormack, Clarke &
   * Buettcher, SIGIR'09): fuse a LEXICAL rank list and a SEMANTIC rank
   * list per query as `Σ 1_000_000 div (rrfK + rank)` — the standard
   * hybrid-search combiner (Elasticsearch/Vespa ship exactly this), in
   * integer micro-units so fused scores are exact across engines.
   *
   * Lexical side: distinct-token overlap computed as an INVERTED-INDEX
   * join — explode distinct tokens on both sides and join on the token,
   * so the exchange is keyed on the token. Postings are pruned by
   * MAX-DOCUMENT-FREQUENCY first: tokens appearing in more than
   * nd/`maxDfDenom` of the corpus (stopwords) are dropped before the
   * pair join, because a stopword's posting list is the corpus — its
   * pairs are query×corpus and its overlap signal is zero. Measured at
   * the sf1 probe: unpruned, the whole query was 706 s (14.6×/unit
   * data — Q·N pairs through "the"); with df ≤ nd/10 it is 22 s, and
   * the residual 1.6×/unit is the SEMANTIC side's labeled-baseline
   * brute force (s1's class), not the lexical join. The surviving
   * overlap counts are the INFORMATIVE ones. This is the sparse/BM25
   * family's join shape + the standard IR stopword cut; a production
   * system swaps the overlap count for BM25 weights with WAND-style
   * upper-bound pruning without changing the plan. Semantic side:
   * cosine top-`pool` — `semantic = "brute"` is the exact
   * [[bruteForceTopK]] baseline (quadratic, grading only); `semantic =
   * "ivf"` routes through [[ivfTopK]] (the production default: each
   * query scores ~nprobe/numCentroids of the corpus). The fusion only
   * consumes (query, neighbor, rank), so any ranker with that contract
   * plugs in.
   *
   * Ranks are dense per query (row_number, ties → min neighbor id); a
   * candidate absent from one list contributes nothing for it (the
   * coalesce is on the CONTRIBUTION, not the rank, so a missing rank is
   * never scored as rank 0). Output ranks report 0 for "absent from
   * that list".
   *
   * Scale shape: both sides end in per-query top-`pool` (window over
   * query-keyed exchanges), the fusion joins two pool-bounded frames on
   * (query, neighbor), and the final top-k is another query-keyed
   * window — every post-index stage is bounded by pool × #queries.
   */
  def hybridRrfTopK(qDocs: DataFrame, cDocs: DataFrame,
                    idCol: String, textCol: String,
                    qVecs: DataFrame, cVecs: DataFrame,
                    vecIdCol: String, vecCol: String,
                    pool: Int = 10, k: Int = 5, rrfK: Int = 60,
                    maxDfDenom: Int = 10,
                    dim: Option[Int] = None,
                    semantic: String = "brute",
                    numCentroids: Int = 16, nprobe: Int = 2): DataFrame = {
    require(Seq("brute", "ivf").contains(semantic),
      s"hybridRrfTopK: semantic must be brute|ivf, got $semantic")
    def toks(df: DataFrame, idAs: String) = df.select(
      col(idCol).cast("long").as(idAs),
      explode(array_distinct(filter(split(Dedup.normText(col(textCol)), " "),
        x => length(x) > 0))).as("tok"))
    val cToks = toks(cDocs, "neighbor_id")
    // stopword cut: df * maxDfDenom <= nd (0 disables — tiny corpora).
    // The kept-vocab frame is vocab-sized and broadcasts into the
    // postings scan; nd rides a 1-row broadcast, no driver collect.
    val cKept =
      if (maxDfDenom <= 0) cToks
      else {
        val dfc = cToks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val nd = cDocs.select(col(idCol)).agg(count(lit(1)).as("nd"))
        val kept = dfc.crossJoin(broadcast(nd))
          .filter(col("df") * maxDfDenom <= col("nd")).select(col("tok"))
        cToks.join(broadcast(kept), "tok")
      }
    val lex = toks(qDocs, "query_id").join(cKept, "tok")
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(count(lit(1)).as("lex_u"))
    val lexR = lex
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("lex_u").desc, col("neighbor_id"))))
      .filter(col("lex_rank") <= pool)
      .select(col("query_id"), col("neighbor_id"), col("lex_rank"))
    // Semantic leg is PLUGGABLE behind the shared (query, neighbor, rank)
    // contract: "brute" is the exact O(Q·N) grading baseline; "ivf" is
    // the production scale path — nprobe/numCentroids of the corpus
    // scored per query against the same deterministic index s3 grades.
    val semTop = semantic match {
      case "ivf" => ivfTopK(qVecs, cVecs, vecIdCol, vecCol, pool, numCentroids, nprobe)
      case _     => bruteForceTopK(qVecs, cVecs, vecIdCol, vecCol, pool, dim)
    }
    val semR = semTop
      .select(col("query_id"), col("neighbor_id"), col("rank").as("sem_rank"))
    lexR.join(semR, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf_u",
        coalesce(expr(s"1000000 div ($rrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($rrfK + sem_rank)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_u").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        coalesce(col("lex_rank"), lit(0)).cast("int").as("lex_rank"),
        coalesce(col("sem_rank"), lit(0)).cast("int").as("sem_rank"),
        col("rrf_u").cast("long").as("rrf_u"), col("rank"))
  }

  /**
   * Random-hyperplane LSH bucket id: sign bits of `numPlanes` deterministic
   * hyperplanes. Plane weights are md5-derived doubles in [-0.5, 0.5),
   * computed on the driver (same value the in-plan md5 expression would
   * give, without 512 hash nodes in the plan).
   */
  def planeWeight(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane:$p:$d".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2, 60) - 0.5
  }

  def lshBucket(vec: Column, dim: Int, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { p =>
      // one native dot against a literal plane vector per bit — compiles to
      // a single loop instead of a dim-term expression tree
      val w = typedlit((0 until dim).map(d => planeWeight(p, d)))
      when(dot(vec, w) > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket —
   *  per-query work drops to ~corpus/2^numPlanes. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, dim: Int, numPlanes: Int = 8): DataFrame = {
    val d = Some(dim)
    val q = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn", d)
      .withColumn("bucket", lshBucket(col("qv"), dim, numPlanes))
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn", d)
      .withColumn("bucket", lshBucket(col("cv"), dim, numPlanes))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotD(col("qv"), col("cv"), d) / (col("qn") * col("cn"))).as("cos_sim"))
    rankTopK(scored, k)
  }

  /**
   * Multi-probe LSH top-k (Lv et al., VLDB'07): each query probes its own
   * bucket AND every bucket at Hamming distance 1 in plane-sign space —
   * the standard recall fix when sign-LSH buckets are too fine (a vector
   * near a hyperplane lands on either side with ~equal probability, so
   * its true neighbors sit one bit away). Candidate volume grows by
   * ×(numPlanes+1) probes over [[lshTopK]] while staying
   * ~corpus/2^numPlanes per probe — still far below the brute-force scan.
   *
   * Scale shape: the probe explode is ids-only (query_id, bucket); pairs
   * are distinct-ed BEFORE vectors re-attach, so the widened candidate
   * set never ships vectors through the probe join.
   */
  def lshMultiProbeTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                        vecCol: String, k: Int, dim: Int,
                        numPlanes: Int = 8): DataFrame = {
    val d = Some(dim)
    val q = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn", d)
      .withColumn("bucket", lshBucket(col("qv"), dim, numPlanes))
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn", d)
      .withColumn("bucket", lshBucket(col("cv"), dim, numPlanes))
    val probeCols = col("bucket") +:
      (0 until numPlanes).map(p => col("bucket").bitwiseXOR(lit(1 << p)))
    val cand = q.select(col("query_id"), explode(array(probeCols: _*)).as("bucket"))
      .join(c.select(col("neighbor_id"), col("bucket")), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val scored = cand
      .join(q.select(col("query_id"), col("qv"), col("qn")), Seq("query_id"))
      .join(c.select(col("neighbor_id"), col("cv"), col("cn")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotD(col("qv"), col("cv"), d) / (col("qn") * col("cn"))).as("cos_sim"))
    rankTopK(scored, k)
  }

  /**
   * IVF-flat approximate top-k: the corpus is partitioned into
   * `numCentroids` Voronoi cells; a query scans only its `nprobe` nearest
   * cells, then exact-cosine-reranks. Per-query work drops from |corpus|
   * to ~nprobe * |corpus| / numCentroids.
   *
   * Centroid selection is deterministic (the vectors with the smallest
   * md5(id) — a reproducible pseudo-random sample) so results are a pure
   * function of the input and oracle-checkable; on a real cluster swap in
   * sampled k-means centroids (driver-side on a tiny sample) — the
   * assign/probe/rerank dataflow below is unchanged. Centroids are
   * broadcast: assignment is a narrow map over the corpus, no shuffle of
   * the embedding column; the candidate join shuffles on the cell id.
   */
  /** Deterministic seed set: the `n` rows with the smallest md5(id),
   *  ranked 1..n as `crank` (a reproducible pseudo-random sample — swap in
   *  k-means products on a real cluster without touching callers). The
   *  rank window runs AFTER limit(n), so its single group is n rows —
   *  bounded regardless of corpus size (allowlisted in the catalog-wide
   *  partitionless-window PlanSpec guard). Input must carry `id`; all
   *  other columns pass through. */
  private def seedSet(corp: DataFrame, n: Int): DataFrame =
    corp.withColumn("h", Hashing.oracleHash(col("id").cast("string")))
      .orderBy(col("h"), col("id")).limit(n)
      .withColumn("crank", row_number().over(Window.orderBy(col("h"), col("id"))))

  /** Cell assignment: rank broadcast centroids (crank, cv, cc) per row by
   *  squared L2 distance spelled (vv + cc) - (2 * v·c) — the exact
   *  expression shape of the SQL oracles, so doubles are bit-identical.
   *  Input needs (id, v, vv); adds `crank` + `__arank_`. */
  private def rankCells(df: DataFrame, cents: DataFrame): DataFrame = {
    val dist2 = col("vv") + col("cc") - lit(2.0) * dot(col("v"), col("cv"))
    df.crossJoin(broadcast(cents))
      .withColumn("__arank_", row_number().over(
        Window.partitionBy(col("id")).orderBy(dist2, col("crank"))))
  }

  private def subVectors(v: Column, subspaces: Int, sub: Int): Column =
    array((0 until subspaces).map(mm => slice(v, mm * sub + 1, sub)): _*)

  /** Explicit (a-b)^2 terms, left-associated — textual mirror of the
   *  oracle's per-subspace distance, so doubles are bit-identical. */
  private def subDist2(a: Column, b: Column, sub: Int): Column =
    (1 to sub).map { i =>
      val d = element_at(a, i) - element_at(b, i); d * d
    }.reduce(_ + _)

  /** PQ codebook from a ranked seed frame: (crank, m, cw) sub-vectors. */
  private def pqCodebook(seeds: DataFrame, subspaces: Int, sub: Int): DataFrame =
    seeds.select(col("crank"), posexplode(subVectors(col("v"), subspaces, sub)).as(Seq("m", "cw")))

  /** Encode each (id, v) corpus row as `subspaces` codeword ids against
   *  the broadcast codebook (map-side min_by argmin, ties to the smallest
   *  codeword id, one (id, m) shuffle), then reconstruct once per vector:
   *  returns (id, r, rr = r·r). */
  private def pqReconstruct(corp: DataFrame, cb: DataFrame,
                            subspaces: Int, sub: Int): DataFrame = {
    val corpSub = corp.select(col("id"), posexplode(subVectors(col("v"), subspaces, sub)).as(Seq("m", "sv")))
    val codes = corpSub.join(broadcast(cb), Seq("m"))
      .groupBy(col("id"), col("m"))
      .agg(min_by(col("crank"),
        array(subDist2(col("sv"), col("cw"), sub), col("crank").cast("double"))).as("code"))
    codes.join(broadcast(cb),
        codes("m") === cb("m") && codes("code") === cb("crank"))
      .select(col("id"), codes("m").as("ms"), col("cw"))
      .groupBy(col("id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("ms"), col("cw")))),
        s => s.getField("cw"))).as("r"))
      .select(col("id"), col("r"), dot(col("r"), col("r")).as("rr"))
  }

  // (id, v, vv = v·v) — vv feeds both the distance and the final norm
  private def withVv(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      dot(col(vecCol), col(vecCol)).as("vv"))

  /** IVF index build, part 1: the deterministic centroid frame
   *  (crank, cv, cc = cv·cv). PERSISTABLE — parquet doubles round-trip
   *  bit-exactly, so a probe against the loaded frame equals the
   *  in-session path. On a real cluster swap the seed-set centroids for
   *  sampled k-means without touching the probe. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   numCentroids: Int = 16): DataFrame =
    seedSet(withVv(corpus, idCol, vecCol), numCentroids)
      .select(col("crank"), col("v").as("cv"), col("vv").as("cc"))

  /** IVF index build, part 2: every corpus vector assigned to its nearest
   *  cell — (crank, id, v, vv). PERSIST THIS PARTITIONED BY `crank`: a
   *  probe reads only its nprobe cells, so the scan prunes to
   *  nprobe/numCentroids of the corpus at the FILE level — the lever
   *  that keeps a 100 TB index queryable without a resident serving
   *  tier.
   *
   *  The argmin is IN-ROW (r17): the centroid frame rides one broadcast
   *  1-row array and each corpus row picks its cell by an in-row
   *  array_sort over struct(dist, crank) — [[ivfProbeStateless]]'s
   *  routing device at nprobe = 1. The previous [[rankCells]] form
   *  shuffled corpus × K rows (each carrying the 64-double vector) into
   *  a per-id rank window just to keep one of the K — at corpus scale
   *  that is a K-times-corpus exchange for a map-side decision (guide
   *  §2.3/§2.4: remove the shuffle outright). Distance expression and
   *  (dist, crank) tie-break are textually [[rankCells]]' — vec_dot IS
   *  [[graft.functions.VectorExpressions.ArrayDotProduct]], so doubles
   *  and therefore assignments are bit-identical (the oracle gate and
   *  MlSpec's probe-parity pins grade it). */
  def ivfAssignments(corpus: DataFrame, centroids: DataFrame,
                     idCol: String, vecCol: String): DataFrame = {
    val centArr = centroids.agg(
      expr("array_sort(collect_list(struct(crank, cv, cc)))").as("cents"))
    withVv(corpus, idCol, vecCol)
      // crossJoin allowlisted: 1-row broadcast centroid-array frame
      .crossJoin(broadcast(centArr))
      // codegen'd argmin (CellArgmin): one generated loop per row — the
      // interpreted array_sort(transform(...)) spelling of the same
      // argmin measured ~20% slower end-to-end on the assignment pass
      .select(graft.functions.VectorExpressions
          .cellArgmin(col("v"), col("vv"), col("cents")).as("crank"),
        col("id"), col("v"), col("vv"))
  }

  /** IVF probe against a prebuilt (possibly loaded-from-parquet) index:
   *  route each query to its `nprobe` nearest cells, score only those
   *  cells' vectors. Output contract identical to [[bruteForceTopK]]. */
  def ivfProbe(queries: DataFrame, centroids: DataFrame, assignments: DataFrame,
               idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val corpCells = assignments
      .select(col("id").as("neighbor_id"), col("v").as("cv2"), col("vv").as("cvv"), col("crank"))
    val queryCells = rankCells(withVv(queries, idCol, vecCol), centroids)
      .filter(col("__arank_") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("vv").as("qvv"), col("crank"))
    val scored = queryCells.join(corpCells, Seq("crank"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv2")) / (sqrt(col("qvv")) * sqrt(col("cvv")))).as("cos_sim"))
    rankTopK(scored, k)
  }

  /**
   * Window-free IVF probe — the STREAMING-SAFE form of [[ivfProbe]] (and
   * its batch twin). Three structural differences, each forced by the
   * streaming engine's rules and each sound at batch scale too:
   *
   *  1. Cell routing is stateless per row: the centroid frame rides ONE
   *     broadcast 1-row ARRAY (16×64 doubles ≈ 8 KB — sized for per-row
   *     attachment) and each query picks its `nprobe` cells by an in-row
   *     array_sort over struct(dist, crank) — bit-identical ordering to
   *     [[ivfProbe]]'s rank window, with no window and no shuffle of the
   *     query stream.
   *  2. The top-k is a [[graft.functions.SketchAggregates.TopKPairs]]
   *     aggregate (k pairs per query as state; order-free merge makes
   *     micro-batch slicing invisible) instead of a rank window — the one
   *     streaming aggregation the engine allows, and at batch scale the
   *     ≤k-pairs-per-task partial-agg shape besides.
   *  3. Similarity is emitted in integer micro-units (`cos_u` = round-6
   *     cosine × 1e6) because the pair state orders on a LONG.
   *
   * Works on a batch OR streaming `queries` frame (streaming: complete
   * output mode; `centroids`/`assignments` stay static — typically loaded
   * from the persisted index). Output: (query_id, neighbor_id, cos_u,
   * rank) — the same neighbors and ranks as [[ivfProbe]] exactly.
   */
  def ivfProbeStateless(queries: DataFrame, centroids: DataFrame,
                        assignments: DataFrame, idCol: String, vecCol: String,
                        k: Int, nprobe: Int = 2): DataFrame = {
    // the routing expression references vec_dot by SQL name (it runs
    // inside a SQL lambda, out of the Column API's reach)
    graft.functions.UdfRegistry.registerSystemUdfs(queries.sparkSession)
    val index = assignments.select(col("crank"), col("id").as("neighbor_id"),
      col("v").as("cv2"), col("vv").as("cvv"))
    // crank is unique, so the default lexicographic struct sort pins the
    // array order deterministically
    val centArr = centroids.agg(
      expr("array_sort(collect_list(struct(crank, cv, cc)))").as("cents"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qv"))
      .withColumn("qvv", dot(col("qv"), col("qv")))
    // (qvv + cc) - (2·dot) is the oracle's exact expression shape, so the
    // in-row sort orders cells identically to the arank window
    val routed = q.crossJoin(broadcast(centArr))
      .withColumn("probe", expr(
        "slice(array_sort(transform(cents, c -> " +
          s"struct(qvv + c.cc - 2 * vec_dot(qv, c.cv) AS d, c.crank AS crank))), 1, $nprobe)"))
      .select(col("query_id"), col("qv"), col("qvv"),
        explode(col("probe.crank")).as("crank"))
    val scored = routed.join(index, Seq("crank"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_u", expr(
        "cast(round(round(vec_dot(qv, cv2) / (sqrt(qvv) * sqrt(cvv)), 6) * 1000000) AS BIGINT)"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.SketchAggregates
        .topKPairs(col("cos_u"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        col("p.v").as("cos_u"), (col("pos") + 1).cast("int").as("rank"))
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, numCentroids: Int = 16, nprobe: Int = 2): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, numCentroids)
    ivfProbe(queries, cents, ivfAssignments(corpus, cents, idCol, vecCol),
      idCol, vecCol, k, nprobe)
  }

  /**
   * IVF index REBALANCE — the maintenance pass a long-lived index needs
   * after incremental ingest ([[ivfAssignments]] appends, s12) has skewed
   * cell sizes: every probe of a hot cell scans its whole population, so
   * one oversized cell sets the index's tail latency. Cells holding more
   * than `splitNum/splitDenom` × the mean population (integer test:
   * `n·K·splitDenom > total·splitNum`) are split in two:
   *
   *  - sub-centroids are the split cell's two smallest-(md5(id), id)
   *    member VECTORS — the same deterministic-seed device as
   *    [[ivfCentroids]], chosen per cell with two `min_by` aggregations
   *    (never a per-cell window: a cell can hold corpus/K rows, and a
   *    rank window keyed on the ≤K-valued `crank` is exactly the
   *    bounded-key single-task shape the plan guards reject);
   *  - ONLY the oversized cells' rows re-rank against their own two
   *    sub-centroids (a broadcast ≤2K-row frame joined on the parent
   *    cell, then the per-id 2-row rank window — [[ivfProbe]]'s routing
   *    shape). On the cell-partitioned layout ([[ivfAssignments]]) that
   *    rewrite touches only the split partitions' files;
   *  - the half nearest sub-seed 1 KEEPS the parent's cell id (its file
   *    partition shrinks in place), the other half gets the fresh id
   *    `maxCrank + parentCrank` — unique by construction with NO rank
   *    window anywhere (cell ids are opaque; gaps are fine) — appended
   *    partitions, no renumbering of untouched cells, so persisted
   *    probes stay valid for every cell the rebalance didn't touch.
   *
   * Returns (newCentroids (crank, cv, cc), newAssignments (crank,
   * parent_crank, id, v, vv)): the same contracts [[ivfProbe]] /
   * [[ivfProbeStateless]] consume, so a probe against the rebalanced
   * index needs no code change. All distance expressions keep the
   * oracle's textual shape — results are engine-reproducible.
   */
  def ivfRebalance(centroids: DataFrame, assignments: DataFrame,
                   splitNum: Int = 3, splitDenom: Int = 2): (DataFrame, DataFrame) = {
    require(splitNum > 0 && splitDenom > 0 && splitNum >= splitDenom,
      s"ivfRebalance: split factor $splitNum/$splitDenom must be >= 1")
    // persisted (CacheLease-tracked — see the class note on ownership):
    // the census, the split-row selection, and the untouched anti-filter
    // each consume this frame — without the cache every consumer
    // re-executes the whole upstream assignment (plan-keyed;
    // bit-identical; loaded-from-parquet indexes re-read cheaply anyway)
    val asg = CacheLease.persist(assignments.select(col("crank"),
      col("crank").as("parent_crank"), col("id"), col("v"), col("vv")))
    val c = censusScalars(centroids, asg)
    splitCellsByIds(centroids, asg, c.hotIds(splitNum, splitDenom), c.mx)
  }

  /** Centroid-complete per-cell census (crank, n) — the one sizing frame
   *  every maintenance decision reads. LEFT-joining the centroid frame to
   *  the assignment counts (missing count ⇒ 0) is what lets a cell with
   *  ZERO assigned rows — the most-starved cell possible, invisible to a
   *  pure groupBy over assignments — be flagged and dissolved; it also
   *  pins `kc` (and hence the mean) to the centroid count for loaded or
   *  hand-built indexes. Both frames are ≤K rows — the join is a tiny
   *  broadcast lookup, never a corpus pass. */
  private def cellCensus(centroids: DataFrame, assignments: DataFrame): DataFrame =
    centroids.select(col("crank"))
      .join(assignments.groupBy(col("crank")).agg(count(lit(1)).as("__n0_")),
        Seq("crank"), "left")
      .select(col("crank"), coalesce(col("__n0_"), lit(0L)).as("n"))

  /** The ≤K-row census COLLECTED to the driver — the documented scalar
   *  pattern, not a collect anti-pattern: the frame is centroid-count
   *  rows however large the corpus. One action replaces what was
   *  previously a census/totals subtree re-executed under every
   *  consumer's broadcast exchange (census → 1-row totals crossJoin →
   *  flag joins: measured as the bulk of s19's ~10 s flat scheduling
   *  overhead); the flag SETS become plain `isin` predicates — no joins
   *  at all — under exactly [[ivfHealth]]'s integer thresholds. */
  private final case class CensusScalars(cells: Seq[(Long, Long)]) {
    val t: Long = cells.map(_._2).sum
    val kc: Long = cells.length.toLong
    val mx: Long = if (cells.isEmpty) 0L else cells.map(_._1).max
    def hotIds(splitNum: Int, splitDenom: Int): Seq[Long] =
      cells.collect { case (c, n) if n * kc * splitDenom > t * splitNum => c }
    def starvedIds(mergeDenom: Int): Seq[Long] =
      cells.collect { case (c, n) if n * kc * mergeDenom < t => c }
  }

  private def censusScalars(centroids: DataFrame, assignments: DataFrame): CensusScalars =
    CensusScalars(cellCensus(centroids, assignments).collect().toSeq
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)))

  /** Literal-count ceiling for the census `isin` selections: the In
   *  expression codegens one comparison per literal, sound at design K
   *  (≤ a few hundred centroids) but codegen-blowup territory on a
   *  DEGENERATE index (K ~ 1e5 cells after runaway splits) — and it
   *  would be rebuilt per consumer. Above the ceiling [[filterCranks]]
   *  falls back to a broadcast semi/anti join against the id list (the
   *  pre-census shape, results identical). MlSpec exercises the
   *  fallback at K > the ceiling against the literal path's output
   *  (via the sys-prop override — test device only). */
  private[ml] def maxInCrankLiterals: Int =
    sys.props.get("graft.census.inMax").map(_.toInt).getOrElse(1000)

  /** `crank ∈ ids` over `df` as a broadcast-free codegen'd predicate
   *  (false for the empty set). Literal values are narrowed to the
   *  column's own integral type so the predicate stays cast-free —
   *  pushdown-eligible on a loaded crank-partitioned index. */
  private def inCranks(df: DataFrame, name: String, ids: Seq[Long]): Column =
    if (ids.isEmpty) lit(false)
    else {
      val vals: Seq[Any] = df.schema(name).dataType match {
        case org.apache.spark.sql.types.IntegerType => ids.map(_.toInt)
        case org.apache.spark.sql.types.ShortType => ids.map(_.toShort)
        case _ => ids
      }
      col(name).isin(vals: _*)
    }

  /** KEEP (semi) or DROP (anti) the rows whose `name` column falls in
   *  `ids`: the codegen'd `isin` literal predicate up to
   *  [[MaxInCrankLiterals]] ids, a broadcast semi/anti join over the id
   *  list beyond it. The ids came off the driver-collected census, so
   *  the local-relation build is census-sized either way; values are
   *  cast to the column's own type so the join stays cast-free.
   *
   *  The two paths must be RESULT-IDENTICAL including on NULL keys (the
   *  crank column is non-null by assignment invariant, but the helper
   *  must not depend on it): `filter(!isin)` drops a NULL row (the
   *  predicate evaluates to NULL) while a bare left_anti would keep it
   *  (NULL never matches the join condition) — so the anti branch
   *  carries an explicit isNotNull conjunct. The semi side agrees for
   *  free (NULL matches neither `isin` nor the equi-join). */
  private[graft] def filterCranks(df: DataFrame, name: String, ids: Seq[Long],
                                  keep: Boolean): DataFrame =
    if (ids.size <= maxInCrankLiterals) {
      val p = inCranks(df, name, ids)
      df.filter(if (keep) p else !p)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val sel = ids.toDF("__crank_sel_")
        .select(col("__crank_sel_").cast(df.schema(name).dataType)
          .as("__crank_sel_"))
      val in = if (keep) df else df.filter(col(name).isNotNull)
      in.join(broadcast(sel), in(name) === sel("__crank_sel_"),
        if (keep) "left_semi" else "left_anti")
    }

  /** The split stage shared by [[ivfRebalance]] and [[ivfMaintain]]:
   *  split each `hotIds` cell of `assign` — which already carries a
   *  `parent_crank` lineage column, preserved through the move so a row
   *  absorbed by a merge and then split out again still reports its
   *  pre-maintenance cell — and return (newCentroids, newAssignments)
   *  under [[ivfRebalance]]'s exact contracts. The fresh half's cell id
   *  is `mx + parent crank` — unique by construction, so the renumber
   *  needs no rank window (cell ids are opaque; gaps are fine). */
  private def splitCellsByIds(centroids: DataFrame, assign: DataFrame,
                              hotIds: Seq[Long], mx: Long): (DataFrame, DataFrame) = {
    // mx rides as a literal in the assignment's own crank type, so the
    // output schema is byte-identical to the pre-driver-census plan
    val crankType = assign.schema("crank").dataType
    val mxLit = lit(mx).cast(crankType)
    // three consumers (two sub-seed aggs + the re-rank) — persist the
    // split-cells-only frame instead of re-filtering per consumer
    val splitRows = CacheLease.persist(
      filterCranks(assign, "crank", hotIds, keep = true)
        .withColumn("h", Hashing.oracleHash(col("id").cast("string"))))
    // two smallest-(h, id) members per split cell via min_by — partial-agg
    // friendly, no per-cell window
    val s1 = splitRows.groupBy(col("crank"))
      .agg(min_by(struct(col("id"), col("v"), col("vv")), struct(col("h"), col("id"))).as("s"))
      .select(col("crank").as("parent"), lit(1).as("srank"),
        col("s.v").as("scv"), col("s.vv").as("scc"), col("s.id").as("sid"))
    val s2 = splitRows
      .join(broadcast(s1.select(col("parent").as("crank"), col("sid").as("sid1"))), Seq("crank"))
      .filter(col("id") =!= col("sid1"))
      .groupBy(col("crank"))
      .agg(min_by(struct(col("id"), col("v"), col("vv")), struct(col("h"), col("id"))).as("s"))
      .select(col("crank").as("parent"), lit(2).as("srank"),
        col("s.v").as("scv"), col("s.vv").as("scc"), col("s.id").as("sid"))
    val subcents = s1.unionAll(s2)
    // re-rank ONLY the split cells' rows against their own 2 sub-centroids
    val dist2 = col("vv") + col("scc") - lit(2.0) * dot(col("v"), col("scv"))
    val moved = splitRows
      .join(broadcast(subcents.withColumnRenamed("parent", "crank")), Seq("crank"))
      .withColumn("__srank_", row_number().over(
        Window.partitionBy(col("id")).orderBy(dist2, col("srank"))))
      .filter(col("__srank_") === 1)
      .select(
        when(col("srank") === 1, col("crank")).otherwise(mxLit + col("crank")).as("crank"),
        col("parent_crank"), col("id"), col("v"), col("vv"))
    val untouched = filterCranks(assign, "crank", hotIds, keep = false)
      .select(col("crank"), col("parent_crank"), col("id"), col("v"), col("vv"))
    val newAssign = untouched.unionAll(moved)
    val keptCents = filterCranks(centroids, "crank", hotIds, keep = false)
      .select(col("crank"), col("cv"), col("cc"))
    // Degenerate-split guard: if EVERY row of an oversized cell ranks
    // nearest the same sub-seed, the other sub-centroid owns an empty
    // cell — a probe routed there spends one of its nprobe slots on zero
    // candidates forever. Keep only sub-centroids whose cell is populated
    // (semi-join the ≤2·K-row sub-centroid frame on moved's distinct
    // cranks — a tiny keyed lookup, no extra corpus pass).
    val populated = moved.select(col("crank")).distinct()
    val newCents = keptCents.unionAll(
      subcents
        .select(
          when(col("srank") === 1, col("parent")).otherwise(mxLit + col("parent")).as("crank"),
          col("scv").as("cv"), col("scc").as("cc"))
        .join(populated, Seq("crank"), "left_semi"))
    (newCents, newAssign)
  }

  /**
   * IVF index HEALTH census (s17) — the monitoring table that closes the
   * index lifecycle (build → ingest → REVIEW → rebalance → serve): per
   * cell, its population, its exact-ppm share of the corpus, and the
   * `hot` flag under the same integer threshold [[ivfRebalance]] splits
   * on — so the monitor's alert and the maintenance pass can never
   * disagree about which cells are oversized. Run it on the persisted
   * assignment frame after every ingest; a rising max share is the
   * early warning that probe tail latency is about to regress.
   *
   * Scale shape: one cell-keyed count over the assignments (partial-agg,
   * ≤K rows out) + a 1-row totals broadcast. Never touches vectors.
   *
   * The census is CENTROID-COMPLETE ([[cellCensus]]): a cell with zero
   * assigned rows — invisible to a pure count over the assignments —
   * reports n_vectors = 0, starved = 1, exactly the cell [[ivfMerge]]
   * must dissolve first.
   */
  def ivfHealth(centroids: DataFrame, assignments: DataFrame, splitNum: Int = 3,
                splitDenom: Int = 2, mergeDenom: Int = 4): DataFrame =
    healthFrom(cellCensus(centroids, assignments), splitNum, splitDenom, mergeDenom)

  /** Assignment-only census variant — for callers without the centroid
   *  frame at hand. CANNOT see empty cells (a centroid with zero assigned
   *  rows never appears in the assignments), so prefer the
   *  centroid-complete overload wherever the centroid frame exists. */
  def ivfHealth(assignments: DataFrame, splitNum: Int,
                splitDenom: Int, mergeDenom: Int): DataFrame =
    healthFrom(assignments.groupBy(col("crank")).agg(count(lit(1)).as("n")),
      splitNum, splitDenom, mergeDenom)

  private def healthFrom(sizes: DataFrame, splitNum: Int,
                         splitDenom: Int, mergeDenom: Int): DataFrame = {
    require(splitNum > 0 && splitDenom > 0 && splitNum >= splitDenom,
      s"ivfHealth: split factor $splitNum/$splitDenom must be >= 1")
    require(mergeDenom >= 1, s"ivfHealth: mergeDenom must be >= 1, got $mergeDenom")
    val tot = sizes.agg(sum(col("n")).as("t"), count(lit(1)).as("kc"))
    // crossJoin allowlisted: 1-row totals frame (reviewed broadcast idiom)
    sizes.crossJoin(broadcast(tot))
      .select(col("crank"), col("n").as("n_vectors"),
        expr("CAST((1000000 * CAST(n AS DECIMAL(38,0))) div t AS BIGINT)")
          .as("share_ppm"),
        (col("n") * col("kc") * lit(splitDenom.toLong) >
          col("t") * lit(splitNum.toLong)).cast("int").as("hot"),
        // the merge threshold under the SAME census (integer test:
        // n·kc·mergeDenom < t ⟺ n < mean/mergeDenom), so the monitor's
        // starved flag and [[ivfMerge]] can never disagree either
        (col("n") * col("kc") * lit(mergeDenom.toLong) < col("t"))
          .cast("int").as("starved"))
  }

  /**
   * IVF index MERGE (s18) — the other half of index maintenance.
   * [[ivfRebalance]] splits hot cells; this dissolves STARVED ones —
   * cells whose population fell below `mean/mergeDenom` (integer test:
   * `n·kc·mergeDenom < t`, the same census frame and discipline as
   * [[ivfHealth]]'s `starved` flag) after ingest drifted away from
   * their region. A starved cell is pure overhead: its centroid takes a
   * routing slot in every probe's in-row sort and an nprobe hit on it
   * returns almost no candidates — recall-dead probes.
   *
   *  - surviving centroids are untouched and NEVER renumbered (cell ids
   *    are opaque; persisted probes stay valid for every cell the merge
   *    didn't dissolve);
   *  - ONLY the starved cells' rows re-rank, against the surviving
   *    centroid frame — the exact [[ivfAssignments]] broadcast-argmin
   *    shape (same distance expression, same (dist, crank) tie-break),
   *    so the merged index is BIT-IDENTICAL to a full re-assignment of
   *    the corpus on the survivors: an untouched row's old centroid
   *    survives and still beats every other survivor, hence re-ranking
   *    it would be a no-op (the probe-contract invariant MlSpec pins);
   *  - at least one cell is always at or above the mean, so the
   *    survivor set is never empty for any `mergeDenom >= 1`.
   *
   * Returns (survivingCentroids (crank, cv, cc), newAssignments (crank,
   * parent_crank, id, v, vv)) — the same contracts [[ivfProbe]] /
   * [[ivfProbeStateless]] consume; `parent_crank != crank` marks the
   * absorbed rows for the audit census.
   */
  def ivfMerge(centroids: DataFrame, assignments: DataFrame,
               mergeDenom: Int = 4): (DataFrame, DataFrame) = {
    require(mergeDenom >= 1, s"ivfMerge: mergeDenom must be >= 1, got $mergeDenom")
    // persisted (CacheLease-tracked): census + starved-row selection +
    // untouched anti-filter all consume this frame (see ivfRebalance)
    val asg = CacheLease.persist(assignments
      .select(col("crank"), col("id"), col("v"), col("vv")))
    val c = censusScalars(centroids, asg)
    mergeCellsByIds(centroids, asg, c.starvedIds(mergeDenom))
  }

  /** The merge stage shared by [[ivfMerge]] and [[ivfMaintain]]: dissolve
   *  the `starvedIds` cells of `assignments` (crank, id, v, vv) into
   *  their nearest surviving centroid and return (survivingCentroids,
   *  newAssignments) under [[ivfMerge]]'s exact contracts. */
  private def mergeCellsByIds(centroids: DataFrame, assignments: DataFrame,
                              starvedIds: Seq[Long]): (DataFrame, DataFrame) = {
    val survivors = filterCranks(centroids, "crank", starvedIds, keep = false)
      .select(col("crank"), col("cv"), col("cc"))
    // two consumers (re-rank input + parent_crank re-attach) — persist
    // the starved-rows-only frame (tiny by definition)
    val srows = CacheLease.persist(
      filterCranks(assignments, "crank", starvedIds, keep = true))
    // re-rank ONLY the starved rows, via ivfAssignments itself so the
    // tie-break/distance discipline can never drift from the build path;
    // the id-keyed join re-attaches the old cell as parent_crank (srows
    // is starved-rows-sized — tiny by definition)
    val moved = ivfAssignments(srows.select(col("id"), col("v")), survivors, "id", "v")
      .join(srows.select(col("id"), col("crank").as("parent_crank")), Seq("id"))
      .select(col("crank"), col("parent_crank"), col("id"), col("v"), col("vv"))
    val untouched = filterCranks(assignments, "crank", starvedIds, keep = false)
      .select(col("crank"), col("crank").as("parent_crank"), col("id"), col("v"), col("vv"))
    (survivors, untouched.unionAll(moved))
  }

  /**
   * COMPOSED index-maintenance pass (s19) — the one stage a real
   * maintenance loop runs after ingest: from a SINGLE centroid-complete
   * census (the same frame, thresholds, and integer tests as
   * [[ivfHealth]]'s `hot`/`starved` flags, so the monitor's alert and
   * this pass can never disagree), dissolve the starved cells into their
   * nearest surviving centroid ([[ivfMerge]]'s stage), then split the
   * hot cells of the POST-MERGE assignments ([[ivfRebalance]]'s stage).
   * Both flag sets come from the pre-maintenance census — a survivor
   * pushed over the hot line by absorbed rows is next cycle's work, not
   * a surprise this cycle — and hot/starved are provably disjoint for
   * any legal thresholds, so the two stages never fight over a cell.
   *
   * `parent_crank` reports each row's PRE-maintenance cell through both
   * stages (a row absorbed from a starved cell and then split out of its
   * absorbing cell still reports the starved origin).
   *
   * Idempotence (MlSpec-pinned): on a balanced index both flag sets are
   * empty and the pass is an exact no-op — assignments pass through
   * byte-identical and probes against the output equal probes against
   * the input. Returns (newCentroids (crank, cv, cc), newAssignments
   * (crank, parent_crank, id, v, vv)) — the contracts [[ivfProbe]] /
   * [[ivfProbeStateless]] consume.
   */
  def ivfMaintain(centroids: DataFrame, assignments: DataFrame,
                  splitNum: Int = 3, splitDenom: Int = 2,
                  mergeDenom: Int = 4): (DataFrame, DataFrame) = {
    require(splitNum > 0 && splitDenom > 0 && splitNum >= splitDenom,
      s"ivfMaintain: split factor $splitNum/$splitDenom must be >= 1")
    require(mergeDenom >= 1, s"ivfMaintain: mergeDenom must be >= 1, got $mergeDenom")
    // The composition has MANY consumers of the assignment frame (the
    // census, the starved-row selection, the untouched anti-filter, then
    // the post-merge frame again for the split's row selection, two
    // sub-seed aggregations, and ITS untouched anti-filter) — persist
    // both or every consumer re-executes the whole upstream assignment
    // (measured 16 s vs ~4 s at sf0.1 on the s19 fixture). CacheLease-
    // tracked, results bit-identical; at cluster scale the assignments
    // arrive LOADED from the crank-partitioned parquet, where each
    // re-read is a cheap pruned scan anyway. Both flag sets come from
    // the ONE driver-collected census (ivfHealth's exact integer tests),
    // and an empty flag set SKIPS its whole stage — the balanced-index
    // no-op is a pass-through projection, not a zero-row re-rank DAG.
    val asg = CacheLease.persist(assignments
      .select(col("crank"), col("id"), col("v"), col("vv")))
    val c = censusScalars(centroids, asg)
    val starved = c.starvedIds(mergeDenom)
    val hot = c.hotIds(splitNum, splitDenom)
    val (survCents, mergedAsg) =
      if (starved.isEmpty)
        (centroids.select(col("crank"), col("cv"), col("cc")),
          asg.select(col("crank"), col("crank").as("parent_crank"),
            col("id"), col("v"), col("vv")))
      else mergeCellsByIds(centroids, asg, starved)
    if (hot.isEmpty) (survCents, mergedAsg)
    else splitCellsByIds(survCents,
      // the split stage has three consumers of the post-merge frame; when
      // the merge was a no-op the frame is a projection of the already-
      // cached asg, so a second cache would only double the storage
      if (starved.isEmpty) mergedAsg else CacheLease.persist(mergedAsg),
      hot, c.mx)
  }

  /**
   * Product-quantization top-k (the memory-compression scale path): each
   * corpus vector is encoded as `m` small codeword ids (here 8 × 4 bits ⇒
   * 8 ids from 16-entry codebooks), queries scan the RECONSTRUCTED
   * vectors with asymmetric squared-L2 distance. Because the subspaces
   * partition the dimensions, sum over subspaces of ‖q_s − cw_s‖² equals
   * the plain 64-dim distance to the concatenated reconstruction — so ADC
   * is one native dot against `r`, not an 8-way join per pair.
   *
   * At 100 TB the win is state size: the scanned side carries 8 codes +
   * norms instead of 64 floats (reconstruction happens once, corpus-side,
   * not per pair), and the encode step is map-side `min_by` against a
   * broadcast 128-row codebook — one shuffle on (id, subspace). Compose
   * with [[ivfTopK]]'s cell routing to also bound the candidate count;
   * the scan here is the labeled full-ADC baseline.
   *
   * Codebooks are deterministic (subvectors of the `codewords` smallest-
   * md5(id) seed vectors — same reproducible-sample device as
   * [[ivfTopK]]); swap in sampled k-means codebooks on a real cluster
   * without touching the dataflow.
   */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
             k: Int, dim: Int = 64, subspaces: Int = 8, codewords: Int = 16): DataFrame = {
    require(dim % subspaces == 0, s"dim $dim not divisible into $subspaces subspaces")
    val sub = dim / subspaces
    val corp = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val cb = pqCodebook(seedSet(corp, codewords), subspaces, sub)
    val recon = pqReconstruct(corp, cb, subspaces, sub)
      .withColumnRenamed("id", "neighbor_id")
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"),
      dot(col(vecCol), col(vecCol)).as("qq"))
    val scored = q.crossJoin(recon)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(col("qq") + col("rr") - lit(2.0) * dot(col("qv"), col("r")), 6)
          .as("adc_dist2"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("adc_dist2"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist2"), col("rank"))
  }

  /**
   * IVF-PQ top-k — the full composition of [[ivfTopK]]'s candidate
   * bounding with [[pqTopK]]'s memory compression, i.e. the standard
   * billion-scale ANN index shape: a query probes its `nprobe` nearest
   * coarse cells and scans only those cells' vectors, each represented by
   * `subspaces` codeword ids (reconstructed once, corpus-side) under
   * asymmetric squared-L2 distance. Per-query work is
   * ~nprobe/numCentroids of the corpus; per-vector state is `subspaces`
   * codes + one norm instead of `dim` floats.
   *
   * One deterministic md5-ordered seed set (size `seedCount`) provides
   * BOTH the coarse centroids and the PQ codebook sub-vectors, keeping
   * the oracle's CTE graph small; on a real cluster swap in k-means
   * products for both without touching the dataflow. Cells route through
   * a keyed join on the cell id; encode is map-side min_by against the
   * broadcast codebook — the only corpus-wide shuffles are keyed.
   */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, seedCount: Int = 16, nprobe: Int = 4,
                dim: Int = 64, subspaces: Int = 8): DataFrame = {
    require(dim % subspaces == 0, s"dim $dim not divisible into $subspaces subspaces")
    val sub = dim / subspaces
    val corp = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      dot(col(vecCol), col(vecCol)).as("vv"))
    val seeds = seedSet(corp, seedCount)
    val cents = seeds.select(col("crank"), col("v").as("cv"), col("vv").as("cc"))
    val corpCells = rankCells(corp, cents).filter(col("__arank_") === 1)
      .select(col("id"), col("crank").as("cell"))
    val qIn = queries.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      dot(col(vecCol), col(vecCol)).as("vv"))
    val queryCells = rankCells(qIn, cents).filter(col("__arank_") <= nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("vv").as("qq"),
        col("crank").as("cell"))
    // PQ encode + reconstruct, sharing the seed set with the centroids
    val cb = pqCodebook(seeds, subspaces, sub)
    val recon = pqReconstruct(corp.select(col("id"), col("v")), cb, subspaces, sub)
    // candidates: only vectors in probed cells, ADC against reconstructions
    val scored = queryCells
      .join(corpCells.join(recon, "id")
        .select(col("id").as("neighbor_id"), col("cell"), col("r"), col("rr")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(col("qq") + col("rr") - lit(2.0) * dot(col("qv"), col("r")), 6)
          .as("adc_dist2"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("adc_dist2"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist2"), col("rank"))
  }

  /**
   * Embedding-cosine near-duplicate pairs, blocked by a coarse key (e.g. a
   * label/cluster column) so the pair join never goes quadratic in the
   * corpus. Output: (id_a < id_b, cos_sim) with cos ≥ threshold.
   */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, blockCol: String,
                   threshold: Double, dim: Option[Int] = None): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      normD(col(vecCol), dim).as("n"), col(blockCol).as("blk"))
    v.as("a").join(v.as("b"), col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(dotD(col("a.v"), col("b.v"), dim) / (col("a.n") * col("b.n")), 6).as("cos_r"))
      .filter(col("cos_r") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_r").as("cos_sim"))
  }

  /**
   * Embedding centroid drift per group (s14): L1 distance between each
   * group's mean vector in a NEW snapshot vs an OLD one — the
   * embedding-space sibling of the token-level corpus-drift monitor
   * (TextAnalysis.corpusDrift): an embedder upgrade, a crawl-source
   * change, or a pipeline bug that shifts a group's vectors moves its
   * centroid long before any per-pair check fires.
   *
   * Exactness: each element is quantized ONCE to micro-units with
   * `floor(double(x) · 1e6)` — float→double widening, the product, and
   * floor are all IEEE-exact, so any engine reproduces the integers
   * bit-for-bit. Mean differences then avoid rounding until the last
   * step: per dimension the drift is
   * `|s_new·n_old − s_old·n_new| div (n_new·n_old)` — one exact
   * cross-multiplied numerator over the dimension's own denominator
   * (ragged vectors get their own per-dim counts), floor-divided ONCE
   * per dimension on a nonnegative numerator (the `abs`) and positive
   * denominator, the regime where Spark's truncating div and DuckDB's
   * floor `//` agree. Products ride DECIMAL(38,0): element sums reach
   * ~2e18 at 1e12 rows, × n ~1e12 = ~2e30 ≪ 1e38.
   *
   * Output: (groupCol, n_new, n_old, dims, l1_drift_u) — l1_drift_u is
   * Σ_d |Δmean_d| in micro-units (each dim floored, so the total
   * under-reports by < dims µu — noise for a drift monitor). Groups
   * present in only one snapshot have no counterpart to diff against
   * and are dropped (inner join).
   *
   * Scale shape: two corpus scans, each exploding vectors into a
   * (group, dim)-keyed sum (map-side partial agg; output is
   * groups × dims rows), one keyed join between the two small frames,
   * one group agg. No window, no crossJoin, no driver read.
   */
  def centroidDrift(newDf: DataFrame, oldDf: DataFrame, groupCol: String,
                    vecCol: String): DataFrame =
    centroidDriftFromSums(
      vectorSums(newDf, groupCol, vecCol, "n_new", "s_new"),
      vectorSums(oldDf, groupCol, vecCol, "n_old", "s_old"), groupCol)

  /** The per-(group, dimension) quantized sum frame [[centroidDrift]]
   *  reduces each snapshot to: (grp, pos, count, sum of floor(x·1e6)).
   *  Count+sum merge order-free, so this SAME aggregation runs as
   *  STREAMING state (complete mode, |groups|·dims rows of state) — feed
   *  the drained frame to [[centroidDriftFromSums]] for the online drift
   *  monitor (q112). */
  def vectorSums(d: DataFrame, groupCol: String, vecCol: String,
                 nName: String, sName: String): DataFrame = d
    .select(col(groupCol).as("grp"), posexplode(expr(
      s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")))
    .groupBy(col("grp"), col("pos"))
    .agg(count(lit(1)).as(nName), sum(col("col")).as(sName))

  /** [[centroidDrift]]'s arithmetic tail over two [[vectorSums]] frames
   *  (columns n_new/s_new and n_old/s_old). */
  def centroidDriftFromSums(nw: DataFrame, od: DataFrame,
                            groupCol: String): DataFrame = {
    nw.join(od, Seq("grp", "pos"))
      .select(col("grp"), col("n_new"), col("n_old"),
        expr("""CAST(abs(cast(s_new AS DECIMAL(38,0)) * n_old
                - cast(s_old AS DECIMAL(38,0)) * n_new)
                div (cast(n_new AS DECIMAL(38,0)) * n_old) AS BIGINT)""").as("d_u"))
      .groupBy(col("grp"))
      .agg(max(col("n_new")).as("n_new"), max(col("n_old")).as("n_old"),
        count(lit(1)).as("dims"), sum(col("d_u")).as("l1_drift_u"))
      .select(col("grp").as(groupCol), col("n_new"), col("n_old"),
        col("dims"), col("l1_drift_u"))
  }
}
