package graft

import graft.ml.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Paired in-JVM A/B of d26's dominant stage D (resolveUpdateFromEdges —
 *  the 8-round subgraph CC loop): checkpoint cadence x loop shuffle
 *  partitions, interleaved so host phases hit every variant equally.
 *  The edge list is checkpointed ONCE up front, so every variant times
 *  exactly the same input through stage D alone.
 *  sbt "Test/runMain graft.ProfileD26D [samplesPerVariant]" */
object ProfileD26D {
  def main(args: Array[String]): Unit = {
    val samples = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def setup(dir: String) = {
      val labels = Queries.resolvedLabels(spark, dir)
      labels.count()
      val idxSigs = Queries.corpusSignatures(spark, dir)
      idxSigs.count()
      val db = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 10 === 0)
      val batch = db.select((col("doc_id") + 600000L).as("doc_id"), col("text"))
        .unionAll(db.select((col("doc_id") + 700000L).as("doc_id"),
          concat(col("text"), lit(" dup dup dup dup")).as("text")))
      val ns = Dedup.minHashSignatures(batch, "text", "doc_id").persist()
      ns.count()
      val nvi = Dedup.lshMatches(ns, idxSigs, 8, 4, 0.5, 1L << 18)
        .select(col("new_id").as("id_a"), col("index_id").as("id_b"))
      val nvn = Dedup.lshCandidatePairs(ns, 8, 4, 0.5)
        .select(col("id_a"), col("id_b"))
      val edges = nvi.unionAll(nvn).localCheckpoint(true)
      ns.unpersist()
      println(s"[d26d] edges=${edges.count()} labels=${labels.count()}")
      (labels, edges)
    }
    // variants: (tag, cadence, shufflePartitions)
    val variants = Seq(
      ("ck4_sh32", "4", "32"),
      ("ck1_sh32", "1", "32"),
      ("ck8_sh32", "8", "32"),
      ("ck4_sh8", "4", "8"),
      ("ck8_sh8", "8", "8"))
    def runOnce(labels: org.apache.spark.sql.DataFrame,
                edges: org.apache.spark.sql.DataFrame,
                cadence: String, shuffle: String): Double = {
      sys.props("graft.labels.updateCkptEvery") = cadence
      val scoped = org.apache.spark.sql.GraftSqlBridge.clonedSession(spark,
        "spark.sql.shuffle.partitions" -> shuffle)
      val l2 = org.apache.spark.sql.GraftSqlBridge.onSession(scoped, labels)
      val e2 = org.apache.spark.sql.GraftSqlBridge.onSession(scoped, edges)
      val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val t0 = System.nanoTime()
      Dedup.resolveUpdateFromEdges(l2, e2, 8).count()
      val dt = (System.nanoTime() - t0) / 1e9
      sys.props.remove("graft.labels.updateCkptEvery")
      // drop ONLY the loop's own checkpoint blocks (the shared input
      // edges/labels checkpoints must survive for the next sample)
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(true))
      dt
    }
    // warm pass at sf0.001 per variant, then interleaved samples at sf0.1
    val (wl, we) = setup("/root/testdata/sf0.001")
    variants.foreach { case (_, c, s) => runOnce(wl, we, c, s) }
    val (labels, edges) = setup("/root/testdata/sf0.1")
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (i <- 1 to samples; (tag, c, s) <- variants) {
      val dt = runOnce(labels, edges, c, s)
      acc(tag) ::= dt
      println(f"[d26d] sample$i $tag $dt%.2f s")
    }
    variants.foreach { case (tag, _, _) =>
      val xs = acc(tag).sorted
      println(f"[d26d] SUMMARY $tag min=${xs.head}%.2f med=${xs(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
