package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the d9 doubling components query:
 *  sbt "Test/runMain graft.ProfileD9" */
object ProfileD9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // AQE matters a lot here: it coalesces the ~5 tiny shuffles per star
      // round to single-task stages (measured 7s vs 37s at sf0.1 with it
      // off). Toggle via env to reproduce.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROFILE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spec = Queries.all.find(_.name == "d9_connected_components").get
    Profile.time("d9 warm (sf0.001)")(spec.run(spark, "/root/testdata/sf0.001").count())
    Profile.time("d9 sf0.1 run1")(spec.run(spark, "/root/testdata/sf0.1").count())
    Profile.time("d9 sf0.1 run2")(spec.run(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
