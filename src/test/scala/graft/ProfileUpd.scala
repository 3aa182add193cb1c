package graft

import org.apache.spark.sql.SparkSession

/** Interleaved full-query A/B of the resolveUpdateFromEdges tuning
 *  (d26/q114/q115/q116): variant A = the new defaults (fused cadence =
 *  iterations, subgraph loop at 8 shuffle partitions), variant B = the
 *  previous committed shape (cadence 4, loop at the session's 32).
 *  sbt "Test/runMain graft.ProfileUpd [samples]" */
object ProfileUpd {
  def main(args: Array[String]): Unit = {
    val samples = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("d26_resolution_update", "q114_stream_soft_dedup",
      "q115_stream_soft_dedup_linked", "q116_stream_gate_capped")
    val specs = names.map(n => n -> Queries.all.find(_.name == n).get)
    def setVariant(v: String): Unit = v match {
      case "new" =>
        sys.props.remove("graft.labels.updateCkptEvery")
        sys.props.remove("graft.labels.updateShuffle")
      case "old" =>
        sys.props("graft.labels.updateCkptEvery") = "4"
        sys.props("graft.labels.updateShuffle") = "32"
    }
    // warm both variants at sf0.001
    Seq("new", "old").foreach { v =>
      setVariant(v)
      specs.foreach { case (_, s) => s.run(spark, "/root/testdata/sf0.001").count() }
    }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (i <- 1 to samples; v <- Seq("new", "old"); (n, s) <- specs) {
      setVariant(v)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val t0 = System.nanoTime()
      s.run(spark, "/root/testdata/sf0.1").count()
      val dt = (System.nanoTime() - t0) / 1e9
      acc(s"$n/$v") ::= dt
      println(f"[upd] sample$i $v $n $dt%.2f s")
    }
    setVariant("new")
    for ((n, _) <- specs; v <- Seq("new", "old")) {
      val xs = acc(s"$n/$v").sorted
      println(f"[upd] SUMMARY $n $v min=${xs.head}%.2f med=${xs(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
