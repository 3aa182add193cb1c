package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Dedup

/** Interleaved in-JVM A/B of the eager candidate-frame cut in the
 *  d15/d28 eval shape: A = cut (localCheckpoint(true) on the candidate
 *  tier), B = no cut (rely on exchange reuse across consumers).
 *  sbt "Test/runMain graft.ProfileCutAB [samples]" */
object ProfileCutAB {
  def main(args: Array[String]): Unit = {
    val samples = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def d15like(dir: String, cut: Boolean): Long = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionAll(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" dup dup dup")).as("text")))
      val truth = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000L).as("id_b"))
      val sh = Dedup.shingles(corpus, "text", "doc_id", 3)
      val sig = Dedup.signaturesFromShingles(sh)
      val cf0 = Dedup.lshCandidatePairs(sig, minEstJaccard = 0.0)
      val candFull = if (cut) cf0.localCheckpoint(true) else cf0
      val cand = candFull.select(col("id_a"), col("id_b"))
      val est = candFull.filter(col("est_jaccard") >= 0.5).select(col("id_a"), col("id_b"))
      val jac = Dedup.ngramJaccard(cand, sh)
        .filter(round(col("jaccard"), 6) >= 0.5).select(col("id_a"), col("id_b"))
      val tagged = cand.withColumn("method", lit("lsh_candidates"))
        .unionAll(est.withColumn("method", lit("est_jaccard_05")))
        .unionAll(jac.withColumn("method", lit("true_jaccard_05")))
      val out = tagged.join(broadcast(truth.withColumn("injected", lit(1))),
          Seq("id_a", "id_b"), "left")
        .groupBy(col("method"))
        .agg(count(lit(1)).as("detected_pairs"),
          sum(coalesce(col("injected"), lit(0))).cast("long").as("detected_injected"))
      out.count()
    }
    def d28like(dir: String, cut: Boolean): Long = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionAll(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" dup dup dup")).as("text")))
      val truth = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000L).as("id_b"))
      val sh = Dedup.shingles(corpus, "text", "doc_id", 3)
      val sig = Dedup.signaturesFromShingles(sh)
      val cap0 = Dedup.capCandidates(
        Dedup.lshCandidatePairs(sig, minEstJaccard = 0.0), 4)
      val capped = if (cut) cap0.localCheckpoint(true) else cap0
      val jac = Dedup.ngramJaccard(capped.select(col("id_a"), col("id_b")), sh)
        .filter(round(col("jaccard"), 6) >= 0.5).select(col("id_a"), col("id_b"))
      val tagged = capped.select(col("id_a"), col("id_b"))
          .withColumn("method", lit("capped_candidates"))
        .unionAll(jac.withColumn("method", lit("capped_true_jaccard_05")))
      tagged.join(broadcast(truth.withColumn("injected", lit(1))),
          Seq("id_a", "id_b"), "left")
        .groupBy(col("method"))
        .agg(count(lit(1)).as("detected_pairs"),
          sum(coalesce(col("injected"), lit(0))).cast("long").as("detected_injected"))
        .count()
    }
    val shape: (String, Boolean) => Long =
      if (args.drop(1).headOption.contains("d28")) d28like else d15like
    Seq(true, false).foreach(c => shape("/root/testdata/sf0.001", c)) // warm
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (i <- 1 to samples; cut <- Seq(true, false)) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val t0 = System.nanoTime()
      shape("/root/testdata/sf0.1", cut)
      val dt = (System.nanoTime() - t0) / 1e9
      acc(if (cut) "cut" else "nocut") ::= dt
      println(f"[cutab] sample$i cut=$cut $dt%.2f s")
    }
    Seq("cut", "nocut").foreach { k =>
      val xs = acc(k).sorted
      println(f"[cutab] SUMMARY $k min=${xs.head}%.2f med=${xs(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
