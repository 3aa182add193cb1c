package graft
import org.apache.spark.sql.SparkSession
/** Scratch: time one catalog query at sf0.1 (warm at sf0.001 first).
 *  sbt "Test/runMain graft.ProfileOne <name>" */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d13_edit_distance")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spec = Queries.all.find(_.name == name).get
    spec.run(spark, "/root/testdata/sf0.001").count()
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = spec.run(spark, "/root/testdata/sf0.1").count()
      println(f"[prof] $name run$i rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
