package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity
/** Ad-hoc s19 cost breakdown (not a test; Test/runMain graft.ProfileS19). */
object ProfileS19 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })
    def counters(tag: String): Unit = {
      println(s"$tag: jobs=${jobs.getAndSet(0)} stages=${stages.getAndSet(0)} taskTimeMs=${taskMs.getAndSet(0)}")
    }
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val anchor = emb.orderBy(col("vec_id")).limit(1).select(col("v").as("av"))
      val hotPlant = emb.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000).as("vec_id"))
        .crossJoin(broadcast(anchor))
        .select(col("vec_id"),
          concat(array(element_at(col("av"), 1) +
              (col("vec_id") % 89).cast("double") / lit(10000.0)),
            slice(col("av"), 2, 63)).as("v"))
      val satPlant = emb.filter(col("vec_id") % 97 === 0)
        .select((col("vec_id") + 300000).as("vec_id"))
        .crossJoin(broadcast(anchor))
        .select(col("vec_id"),
          concat(array((-element_at(col("av"), 1) - lit(50.0)) +
              (col("vec_id") % 13).cast("double") / lit(1000.0)),
            transform(slice(col("av"), 2, 63), x => -x - lit(50.0))).as("v"))
      val cents8 = Similarity.ivfCentroids(emb, "vec_id", "v", 8)
      val c9 = anchor.select(lit(9).as("crank"),
        concat(array(-element_at(col("av"), 1) - lit(50.0)),
          transform(slice(col("av"), 2, 63), x => -x - lit(50.0))).as("cv"))
        .withColumn("cc", Similarity.dot(col("cv"), col("cv")))
      val cents = cents8.unionAll(c9).persist()
      time("cents materialize")(cents.count())
      val asg = Similarity.ivfAssignments(
        emb.unionAll(hotPlant).unionAll(satPlant), cents, "vec_id", "v").persist()
      time("asg materialize")(asg.count())
      counters("pre-maintain")
      time("maintain")(Similarity.ivfMaintain(cents, asg, 3, 2, 4)._2.count())
      counters("maintain")
      time("maintain again")(Similarity.ivfMaintain(cents, asg, 3, 2, 4)._2.count())
      counters("maintain2")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
