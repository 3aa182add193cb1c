package graft

import graft.ml.{Dedup, Hashing}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: sbt "Test/runMain graft.Profile" */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warmup")(spark.range(100000).groupBy(expr("id % 7")).count().count())
    time("docs count")(docs.count())
    val norm = time("normText only")(
      docs.select(Dedup.normText(col("text")).as("t")).agg(count(lit(1))).collect())
    time("shingles no-distinct")(
      Dedup.shingles(docs, "text", "doc_id", 3, distinct = false).count())
    time("shingles distinct")(
      Dedup.shingles(docs, "text", "doc_id", 3).count())
    time("base md5 hash")(
      Dedup.shingles(docs, "text", "doc_id", 3, distinct = false)
        .select(Hashing.oracleHash(col("shingle")).as("h")).agg(max(col("h"))).collect())
    time("full signatures")(
      Dedup.minHashSignatures(docs, "text", "doc_id").count())
    time("full signatures 2nd")(
      Dedup.minHashSignatures(docs, "text", "doc_id").count())
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" dup dup dup")).as("text")))
    val pairs = time("lsh pairs")(
      { val p = Dedup.lshCandidatePairs(Dedup.minHashSignatures(corpus, "text", "doc_id")); p.count(); p })
    time("cluster labels")(Dedup.clusterLabels(pairs).count())
    spark.stop()
  }
}
