package graft

import graft.ml.{Dedup, TextAnalysis}
import graft.utils.DataframeHelper
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of d9_connected_components / d18_canonical_rep —
 *  the r16 optimization round's top-cost pair. Mirrors the query
 *  internals with explicit cuts:
 *    A  docs read + langId projection (count)
 *    B  langChainEdges: perGroupSequence window + self-join (count)
 *    C  clusterLabelsStars over the edges (count)
 *    D  the final docs-left-join-labels assembly (count) — d9's shape
 *    E  d18 extra: qualityScore projection + rank window (count)
 *  Run: sbt "Test/runMain graft.ProfileD9" (or java -cp with test classes)
 */
object ProfileD9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d9] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def perGroupSeq(docs: org.apache.spark.sql.DataFrame) =
      DataframeHelper.perGroupSequence(
        docs.select(col("doc_id"), col("lang")), Seq("lang"), Seq("doc_id"), "sq")
    def run(dir: String, tag: String): Unit = {
      println(s"--- $tag $dir")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
      t("A_docs_langid")(docs.count())
      val seq = perGroupSeq(docs)
      val prev = seq.select(col("lang"), (col("sq") + 1).as("sq"), col("doc_id").as("id_a"))
      val cur = seq.select(col("lang"), col("sq"), col("doc_id").as("id_b"))
      val edges = prev.join(cur, Seq("lang", "sq")).select(col("id_a"), col("id_b"))
      t("B_edges")(edges.count())
      val labels = t("C_stars")(
        { val l = Dedup.clusterLabelsStars(edges); l.count(); l })
      t("D_join")(docs.join(labels, docs("doc_id") === labels("id"), "left")
        .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .count())
      // full query end-to-end for reference
      t("FULL_d9")(SparkEntry.queries("d9_connected_components")(spark, dir).count())
      t("FULL_d18")(SparkEntry.queries("d18_canonical_rep")(spark, dir).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    run("/root/testdata/sf0.001", "warm")
    for (i <- 1 to 2) run("/root/testdata/sf0.1", s"run$i")
    spark.stop()
  }
}
