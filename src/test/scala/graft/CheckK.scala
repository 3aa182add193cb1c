package graft
import org.apache.spark.sql.SparkSession
object CheckK {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale/sf1");
         name <- Seq("k1_hll_distinct", "k2_kll_quantiles")) {
      val rows = Queries.all.find(_.name == name).get.run(spark, dir).collect()
      val bad = rows.filter(r => r.getAs[Int]("within") != 1)
      println(s"[checkk] $dir $name rows=${rows.length} bad=${bad.length} " +
        (if (bad.nonEmpty) bad.mkString("; ") else "all-within"))
    }
    spark.stop()
  }
}
