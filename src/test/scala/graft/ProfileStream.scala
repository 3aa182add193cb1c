package graft
import org.apache.spark.sql.SparkSession
/** Scratch profiler for streaming drain latency vs shuffle partitions. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val names = Seq("q44_stream_stream_join", "q48_stream_outer_join",
      "q69_stream_dedup_watermark", "q27_stream_tumbling")
    for (n <- names) { // warm
      Queries.all.find(_.name == n).get.run(spark, "/root/testdata/sf0.001").count()
    }
    for (sp <- Seq("8", "4", "2"); n <- names) {
      sys.props("graft.drain.shuffle") = sp
      val t0 = System.nanoTime()
      Queries.all.find(_.name == n).get.run(spark, dir).count()
      println(f"[prof] sp=$sp $n%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
