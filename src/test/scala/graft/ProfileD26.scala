package graft

import graft.ml.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of d26_resolution_update (the round-15/16 watch
 *  item: d26 reads 4.5 s quiet but 8-13 s in diffuse co-tenant phases —
 *  the largest diffuse amplification in the catalog; hypothesis was the
 *  localCheckpoint materialization). Mirrors Dedup.resolveUpdate's
 *  internals with explicit cuts so each stage's share is visible:
 *    A  artifact reads (resolution labels + index signatures)
 *    B  batch minhash signatures, persisted + materialized
 *    C  edge list: one-sided LSH match + batch-internal pairs,
 *       localCheckpoint(true) — the suspected sensitive step
 *    D  resolveUpdateFromEdges (star edges + CC rounds + stitch)
 *  Run twice per invocation (first = warm-ish after an sf0.001 pass);
 *  compare stage SHARES across a loaded and a quiet host phase.
 *  sbt "Test/runMain graft.ProfileD26" */
object ProfileD26 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def stages(dir: String, tag: String): Unit = {
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[d26] $tag $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val labels = t("A1_labels_read") {
        val l = Queries.resolvedLabels(spark, dir); l.count(); l }
      val idxSigs = t("A2_index_sigs_read") {
        val s = Queries.corpusSignatures(spark, dir); s.count(); s }
      val db = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 10 === 0)
      val batch = db.select((col("doc_id") + 600000L).as("doc_id"), col("text"))
        .unionAll(db.select((col("doc_id") + 700000L).as("doc_id"),
          concat(col("text"), lit(" dup dup dup dup")).as("text")))
      val ns = t("B_batch_sigs_persist") {
        val s = Dedup.minHashSignatures(batch, "text", "doc_id").persist()
        s.count(); s }
      val edges = t("C_edges_localCheckpoint") {
        val nvi = Dedup.lshMatches(ns, idxSigs, 8, 4, 0.5, 1L << 18)
          .select(col("new_id").as("id_a"), col("index_id").as("id_b"))
        val nvn = Dedup.lshCandidatePairs(ns, 8, 4, 0.5)
          .select(col("id_a"), col("id_b"))
        nvi.unionAll(nvn).localCheckpoint(true) }
      ns.unpersist()
      t("D_resolveUpdateFromEdges") {
        Dedup.resolveUpdateFromEdges(labels, edges, 8).count() }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    stages("/root/testdata/sf0.001", "warm")
    for (i <- 1 to 2) stages("/root/testdata/sf0.1", s"run$i")
    spark.stop()
  }
}
