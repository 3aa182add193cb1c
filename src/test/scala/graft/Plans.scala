package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: sbt "Test/runMain graft.Plans [query ...]" — prints
  * explain(formatted) for the named catalog queries (default: a
  * pushdown/broadcast-sensitive subset). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val wanted = if (args.nonEmpty) args.toSet
      else Set("q2_filter_project", "q5_star_join_agg", "q13_topk", "q1_pricing_summary")
    Queries.all.filter(s => wanted.contains(s.name)).foreach { s =>
      println(s"\n======== ${s.name} ========")
      s.run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
