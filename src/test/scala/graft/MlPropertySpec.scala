package graft

import graft.ml.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/**
 * Property tests for the round-5 ML operators against independent plain-
 * Scala reference implementations on GENERATED inputs — the oracle gate
 * proves one fixture corpus; these prove the algebra on many random ones.
 *
 * Both comparisons are exact (no tolerance): BM25 is all-integer by
 * construction, and the semDedup reference recomputes cosines with the
 * same left-associated double fold + HALF_UP rounding the native
 * expressions use, so agreement is bit-for-bit even at threshold
 * boundaries.
 */
class MlPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  // --- BM25 ---------------------------------------------------------------

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "rare", "common")
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 10)
    docs <- Gen.listOfN(nDocs, Gen.choose(1, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Plain-Scala mirror of the integer-rational BM25 (k1=1.2, b=0.75). */
  private def refBm25(docs: Seq[(Long, String)], terms: Seq[String]): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    val dl = toks.map { case (id, ts) => id -> ts.length.toLong }
    val n = docs.length.toLong
    val avgdl = dl.values.sum / n
    val tf = toks.toSeq
      .flatMap { case (id, ts) => ts.filter(terms.contains).map(t => (id, t)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val dfc = tf.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    docs.map { case (id, _) =>
      val matched = tf.collect { case ((i, t), c) if i == id => (t, c) }
      val score = matched.map { case (t, c) =>
        val d = dfc(t)
        (10000L * (2 * n - 2 * d + 1) * 44L * avgdl * c) /
          ((2 * d + 1) * (20L * avgdl * c + 6L * avgdl + 18L * dl(id)))
      }.sum
      id -> (matched.size.toLong, score)
    }.toMap
  }

  test("bm25Scores matches the plain-Scala integer reference on random corpora") {
    implicit val s = spark
    import spark.implicits._
    val terms = Seq("rare", "common")
    samples(corpusGen, 12).foreach { docs =>
      val out = TextAnalysis.bm25Scores(docs.toDF("doc_id", "text"), "text", "doc_id", terms)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      withClue(docs.toString) { out shouldBe refBm25(docs, terms) }
    }
  }

  // --- SemDeDup -----------------------------------------------------------

  private val vecGen: Gen[Array[Double]] =
    Gen.listOfN(4, Gen.choose(-3, 3).map(_.toDouble))
      .suchThat(_.exists(_ != 0.0)).map(_.toArray)
  private val vecSetGen: Gen[Seq[(Long, Array[Double])]] = for {
    n <- Gen.choose(6, 14)
    vs <- Gen.listOfN(n, vecGen)
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  /** Same left-assoc double fold + HALF_UP 6-digit round as the native
   *  vector expressions (parity pinned in MlSpec), so the reference rule
   *  agrees bit-for-bit even when a cosine lands exactly on threshold. */
  private def cosR(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    val c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  // --- chunk dedup --------------------------------------------------------

  private val chunkCorpusGen: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(1, 8)
    docs <- Gen.listOfN(nDocs, Gen.choose(1, 25).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Plain-Scala mirror of chunkDedup's first-occurrence rule. */
  private def refChunkDedup(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String)] = {
    val chunks = docs.sortBy(_._1).flatMap { case (id, t) =>
      t.toLowerCase.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty)
        .grouped(w).zipWithIndex.map { case (g, i) => (id, i.toLong, g.mkString(" ")) }
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val kept = chunks.filter { case (_, _, c) => seen.add(c) }.groupBy(_._1)
    chunks.groupBy(_._1).map { case (id, cs) =>
      val k = kept.getOrElse(id, Seq.empty).sortBy(_._2)
      id -> ((cs.length.toLong, k.length.toLong, k.map(_._3).mkString(" ")))
    }
  }

  test("chunkDedup matches the first-occurrence reference on random corpora") {
    implicit val s = spark
    import spark.implicits._
    for (w <- Seq(1, 3, 10); corpus <- samples(chunkCorpusGen, 4)) {
      val out = Dedup.chunkDedup(corpus.toDF("doc_id", "text"), "text", "doc_id", w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      withClue(s"w=$w corpus=$corpus") { out shouldBe refChunkDedup(corpus, w) }
    }
  }

  test("semDedup's dup rule: flagged iff a same-cluster lower-id witness has cos >= threshold") {
    implicit val s = spark
    import spark.implicits._
    val tau = 0.9
    samples(vecSetGen, 5).foreach { vecs =>
      val byId = vecs.toMap
      val out = Dedup.semDedup(vecs.toDF("vec_id", "v"), "vec_id", "v",
          dim = 4, k = 3, iterations = 2, threshold = tau)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      out.keySet shouldBe byId.keySet
      // trust the (oracle-tested) clustering; verify the pruning rule
      out.foreach { case (id, (cluster, isDup)) =>
        val witness = out.exists { case (j, (cj, _)) =>
          j < id && cj == cluster && cosR(byId(j), byId(id)) >= tau
        }
        withClue(s"id=$id cluster=$cluster vecs=$vecs") {
          isDup shouldBe (if (witness) 1 else 0)
        }
      }
    }
  }
}
