package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch: phase breakdown of t35 at sf0.1.
 *  sbt "Test/runMain graft.ProfileT35" */
object ProfileT35 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val langsList = Seq("de", "en", "es", "fr", "zh")
    def mutDf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", expr(
          """transform(
            |  filter(split(lower(regexp_replace(text, '\\s+', ' ')), ' '),
            |         x -> length(x) > 0),
            |  w -> CASE WHEN lang = 'es' THEN concat(w, 'cion')
            |            WHEN lang = 'de' THEN concat(w, 'en')
            |            WHEN lang = 'fr' THEN concat('le', w)
            |            WHEN lang = 'zh' THEN reverse(w)
            |            ELSE w END)""".stripMargin)).as("text"))
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      val mut = mutDf
      val train = mut.filter(col("doc_id") % 5 =!= 0)
      val eval = mut.filter(col("doc_id") % 5 === 0)
      val bag = time(s"r$i bag+ckpt")(graft.ml.TextAnalysis.charTrigramBag(train, "doc_id", "text", 512)
        .join(train.select(col("doc_id").as("id"), col("lang").as("__lang_")), Seq("id"))
        .localCheckpoint(true))
      bag.unpersist(true)
      val w = time(s"r$i train")(graft.ml.TextAnalysis.langIdTrain(train, "doc_id", "text", "lang", langsList, 2, 512)
        .localCheckpoint(true))
      val pred = time(s"r$i apply")(graft.ml.TextAnalysis.langIdApply(eval, "doc_id", "text", w, 512)
        .localCheckpoint(true))
      time(s"r$i grade") {
        eval.select(col("doc_id"), col("lang"),
            graft.ml.TextAnalysis.langId(col("text")).as("sw_pred"))
          .join(pred, col("doc_id") === pred("id")).groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("lang_pred") === col("lang"), 1L).otherwise(0L)).as("ct"),
            sum(when(col("sw_pred") === col("lang"), 1L).otherwise(0L)).as("cs")).count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
