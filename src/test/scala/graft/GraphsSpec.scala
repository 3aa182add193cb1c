package graft

import graft.ml.Graphs
import graft.core.{JobContext, PipelineContext}

/** Graph algorithms checked against independent plain-Scala references
 *  (Map/loop implementations of the same fixed-round integer recurrences)
 *  on small graphs whose structure exercises the edge semantics:
 *  pendant chains for k-core, a bridge between cliques for LPA, and an
 *  asymmetric-degree graph for PageRank. */
class GraphsSpec extends SparkSpec {

  private def edgeDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  // --- plain-Scala references -------------------------------------------

  private def symPairs(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map { case (a, b) => (b, a) }

  private def refPageRank(e: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = e.groupBy(_._1)
    val deg = out.map { case (n, es) => n -> es.size.toLong }
    val nodes = e.map(_._1).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(n => n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def refKCore(e0: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    var e = e0
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter { case (s, d) => keep(s) && keep(d) }
    }
    e.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
  }

  private def refLpa(e: Seq[(Long, Long)], nodes: Seq[Long], rounds: Int): Map[Long, Long] = {
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      val best = e.groupBy(_._1).map { case (n, es) =>
        val counts = es.groupBy { case (_, d) => lab(d) }.map { case (l, g) => (l, g.size) }
        // max count, then min label
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
      lab = lab.map { case (n, l) => n -> best.getOrElse(n, l) }
    }
    lab
  }

  /** Directed reference WITH the dangling-mass correction: node set is
   *  src ∪ dst, each round the sinks' total rank is shared out `dm / n`
   *  per node inside the damped term. */
  private def refPageRankDangling(e: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = e.groupBy(_._1).map { case (n0, es) => n0 -> es.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toLong
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      val dm = nodes.filterNot(deg.contains).map(r).sum
      r = nodes.map(nd =>
        nd -> (150000L + 85L * (contrib.getOrElse(nd, 0L) + dm / n) / 100L)).toMap
    }
    r
  }

  // --- pagerank ---------------------------------------------------------

  test("pageRankQuantized matches the integer power-iteration reference") {
    // star (1 hub, 3 leaves) + a separate path, symmetrized: degrees 1..3
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (6L, 7L))
    val got = Graphs.pageRankQuantized(Graphs.symmetrize(edgeDf(base)), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe refPageRank(symPairs(base), 3)
    // hub outranks every leaf
    got(1L) should be > got(2L)
  }

  test("pageRankQuantized redistributes dangling mass on a directed graph with sinks") {
    // 1→2, 1→3, 2→3: node 3 is a SINK (dst-only). It must (a) appear in
    // the output at all — the old src-only node set dropped it — and
    // (b) feed its rank back uniformly each round instead of absorbing it
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val got = Graphs.pageRankQuantized(edgeDf(base), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe refPageRankDangling(base, 3)
    got.keySet shouldBe Set(1L, 2L, 3L)
    // the sink collects from both 1 and 2 — highest rank
    got(3L) should be > got(2L)
    got(2L) should be > got(1L)
    // a sink-free symmetric graph is bit-identical under both references:
    // the dangling term is exactly zero
    val sym = Seq((1L, 2L), (2L, 3L))
    val gotSym = Graphs.pageRankQuantized(Graphs.symmetrize(edgeDf(sym)), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    gotSym shouldBe refPageRank(symPairs(sym), 3)
    gotSym shouldBe refPageRankDangling(symPairs(sym), 3)
  }

  // --- kcore ------------------------------------------------------------

  test("kCore peels pendant chains and keeps the clique") {
    // 4-clique {1,2,3,4} with a pendant chain 4-5-6
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val got = Graphs.kCore(Graphs.symmetrize(edgeDf(base)), k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe refKCore(symPairs(base), 3, 3)
    got.keySet shouldBe Set(1L, 2L, 3L, 4L)  // chain peeled, clique intact
    got.values.toSet shouldBe Set(3L)
  }

  test("kCore round count matters: one round leaves the second chain node") {
    // peeling 6 (degree 1) leaves 5 at degree 1 — only round 2 removes it
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val r1 = Graphs.kCore(Graphs.symmetrize(edgeDf(base)), k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    val r2 = Graphs.kCore(Graphs.symmetrize(edgeDf(base)), k = 2, rounds = 2)
      .collect().map(_.getLong(0)).toSet
    r1 shouldBe Set(1L, 2L, 3L, 4L, 5L)
    r2 shouldBe Set(1L, 2L, 3L, 4L)
    r1 shouldBe refKCore(symPairs(base), 2, 1).keySet
    r2 shouldBe refKCore(symPairs(base), 2, 2).keySet
  }

  // --- label propagation ------------------------------------------------

  test("labelPropagation matches the synchronous reference on two bridged triangles") {
    // triangles {1,2,3} and {7,8,9} bridged by 3-7: communities should
    // stay distinct per triangle after 3 rounds
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L), (7L, 9L), (8L, 9L), (3L, 7L))
    val nodes = Seq(1L, 2L, 3L, 7L, 8L, 9L)
    val got = Graphs.labelPropagation(
      Graphs.symmetrize(edgeDf(base)),
      edgeDf(nodes.map(n => (n, n))).select(org.apache.spark.sql.functions.col("src").as("node")),
      rounds = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe refLpa(symPairs(base), nodes, 3)
  }

  test("labelPropagation: isolated node keeps its own label") {
    val base = Seq((1L, 2L))
    val nodes = Seq(1L, 2L, 99L) // 99 has no edges
    val got = Graphs.labelPropagation(
      Graphs.symmetrize(edgeDf(base)),
      edgeDf(nodes.map(n => (n, n))).select(org.apache.spark.sql.functions.col("src").as("node")),
      rounds = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got(99L) shouldBe 99L
    got shouldBe refLpa(symPairs(base), nodes, 3)
  }

  test("labelPropagation ties break deterministically (max count, then min label)") {
    // node 0 with two neighbors of distinct labels (counts tie) -> min label
    val base = Seq((10L, 20L), (10L, 30L))
    val nodes = Seq(10L, 20L, 30L)
    val got = Graphs.labelPropagation(
      Graphs.symmetrize(edgeDf(base)),
      edgeDf(nodes.map(n => (n, n))).select(org.apache.spark.sql.functions.col("src").as("node")),
      rounds = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got(10L) shouldBe 20L // tie between labels 20 and 30 -> min
    got shouldBe refLpa(symPairs(base), nodes, 1)
  }

  // --- actor surface ----------------------------------------------------

  test("GraphActor dispatches methods and symmetrizes by default") {
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b").createOrReplaceTempView("g_edges")

    val kc = new graft.ml.GraphActor
    kc.init(Map("view" -> "g_edges", "method" -> "kcore",
      "srcField" -> "a", "dstField" -> "b", "k" -> "3", "rounds" -> "3"))
    kc.run(ctx).get.collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L, 4L)

    val pr = new graft.ml.GraphActor
    pr.init(Map("view" -> "g_edges", "method" -> "pagerank", "srcField" -> "a",
      "dstField" -> "b", "rounds" -> "2"))
    val prMap = pr.run(ctx).get.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    prMap shouldBe refPageRank(symPairs(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L))), 2)

    val lpa = new graft.ml.GraphActor
    lpa.init(Map("view" -> "g_edges", "method" -> "label-propagation",
      "srcField" -> "a", "dstField" -> "b", "rounds" -> "2"))
    val lpaMap = lpa.run(ctx).get.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lpaMap.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L)

    an[IllegalArgumentException] should be thrownBy {
      val bad = new graft.ml.GraphActor
      bad.init(Map("view" -> "g_edges", "method" -> "bfs"))
    }
  }

  test("g2b degree-oriented triangle count equals g2's wedge-join count; oriented wedges never exceed naive") {
    implicit val s = spark
    val g2 = Queries.all.find(_.name == "g2_triangle_count").get
      .run(spark, sfDir).collect().head
    val g2b = Queries.all.find(_.name == "g2b_triangle_oriented").get
      .run(spark, sfDir).collect().head
    // both algorithms must count the SAME triangles (orientation gives
    // each triangle a unique minimum vertex — no /3, no over/undercount)
    g2b.getAs[Long]("n_triangles") shouldBe g2.getAs[Long]("n_triangles")
    g2b.getAs[Long]("n_nodes") shouldBe g2.getAs[Long]("n_nodes")
    g2b.getAs[Long]("n_edges") shouldBe g2.getAs[Long]("n_edges")
    g2b.getAs[Long]("cc_ppm") shouldBe g2.getAs[Long]("cc_ppm")
    // the point of the orientation: wedge work can only shrink
    g2b.getAs[Long]("n_wedges_oriented") should be <= g2b.getAs[Long]("n_wedges_naive")
  }
}
