package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Interleaved A/B of ivfAssignments' argmin forms on s12's shape:
 *  A = in-row (broadcast centroid array + array_sort transform),
 *  B = rank window over crossJoin (the r16 form),
 *  C = min_by groupBy (map-side partial agg, one N-row exchange).
 *  Times the s12 query end-to-end with each assignment form.
 *  sbt "Test/runMain graft.ProfileAsg [samples]" */
object ProfileAsg {
  def main(args: Array[String]): Unit = {
    val samples = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.UdfRegistry.registerSystemUdfs(spark)
    def withVv(df: DataFrame): DataFrame =
      df.select(col("vec_id").cast("long").as("id"), col("v"),
        Similarity.dot(col("v"), col("v")).as("vv"))
    def asgInRow(corp: DataFrame, cents: DataFrame): DataFrame = {
      val centArr = cents.agg(
        expr("array_sort(collect_list(struct(crank, cv, cc)))").as("cents"))
      withVv(corp).crossJoin(broadcast(centArr))
        .withColumn("__best_", expr(
          "element_at(array_sort(transform(cents, c -> " +
            "struct(vv + c.cc - 2 * vec_dot(v, c.cv) AS d, c.crank AS crank))), 1)"))
        .select(col("__best_.crank").as("crank"), col("id"), col("v"), col("vv"))
    }
    def asgNative(corp: DataFrame, cents: DataFrame): DataFrame = {
      val centArr = cents.agg(
        expr("array_sort(collect_list(struct(crank, cv, cc)))").as("cents"))
      withVv(corp).crossJoin(broadcast(centArr))
        .select(graft.functions.VectorExpressions
            .cellArgmin(col("v"), col("vv"), col("cents")).as("crank"),
          col("id"), col("v"), col("vv"))
    }
    def asgWindow(corp: DataFrame, cents: DataFrame): DataFrame = {
      val dist2 = col("vv") + col("cc") - lit(2.0) * Similarity.dot(col("v"), col("cv"))
      withVv(corp).crossJoin(broadcast(cents))
        .withColumn("__arank_", row_number().over(
          Window.partitionBy(col("id")).orderBy(dist2, col("crank"))))
        .filter(col("__arank_") === 1)
        .select(col("crank"), col("id"), col("v"), col("vv"))
    }
    def asgMinBy(corp: DataFrame, cents: DataFrame): DataFrame = {
      val dist2 = col("vv") + col("cc") - lit(2.0) * Similarity.dot(col("v"), col("cv"))
      withVv(corp).crossJoin(broadcast(cents))
        .groupBy(col("id"))
        .agg(min_by(struct(col("crank"), col("v"), col("vv")),
          struct(dist2, col("crank"))).as("b"))
        .select(col("b.crank").as("crank"), col("id"), col("b.v").as("v"),
          col("b.vv").as("vv"))
    }
    val forms = Seq("inrow" -> asgInRow _, "native" -> asgNative _,
      "window" -> asgWindow _, "minby" -> asgMinBy _)
    def s12like(dir: String,
                asg: (DataFrame, DataFrame) => DataFrame): Long = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val base = emb.filter(col("vec_id") % 10 =!= 0)
      val batch = emb.filter(col("vec_id") % 10 === 0)
      val cents = Similarity.ivfCentroids(base, "vec_id", "v", 16)
      val index = asg(base, cents).unionAll(asg(batch, cents))
      Similarity.ivfProbe(emb.filter(col("vec_id") % 50 === 0), cents, index,
        "vec_id", "v", 5, 2).count()
    }
    // pure-assignment cost over the whole corpus (a noop-style count of
    // every column via a trivial agg over all fields)
    def pureAsg(dir: String,
                asg: (DataFrame, DataFrame) => DataFrame): Long = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val cents = Similarity.ivfCentroids(emb, "vec_id", "v", 16)
      asg(emb, cents).agg(sum(col("crank") + col("id")), sum(col("vv")),
        sum(element_at(col("v"), 1))).count()
    }
    val shapes = Seq("s12" -> s12like _, "pure" -> pureAsg _)
    for ((_, sh) <- shapes; (_, f) <- forms) sh("/root/testdata/sf0.001", f) // warm
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (i <- 1 to samples; (sn, sh) <- shapes; (tag, f) <- forms) {
      val t0 = System.nanoTime()
      sh("/root/testdata/sf0.1", f)
      val dt = (System.nanoTime() - t0) / 1e9
      acc(s"$sn/$tag") ::= dt
      println(f"[asg] sample$i $sn/$tag $dt%.2f s")
    }
    for ((sn, _) <- shapes; (tag, _) <- forms) {
      val xs = acc(s"$sn/$tag").sorted
      println(f"[asg] SUMMARY $sn/$tag min=${xs.head}%.2f med=${xs(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
