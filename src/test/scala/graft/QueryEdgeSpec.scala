package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Edge-case fixtures for catalog queries — cases the sf* test data does
 *  not exercise but real corpora will. */
class QueryEdgeSpec extends SparkSpec {

  test("q42_pivot fills absent (priority,status) cells with 0, not NULL") {
    // fixture where no order has status 'P' and one priority has no 'O'
    val dir = tmpDir("pivot_edge")
    val schema = StructType(Seq(
      StructField("o_orderpriority", StringType),
      StructField("o_orderstatus", StringType)))
    val rows = Seq(
      Row("1-URGENT", "F"), Row("1-URGENT", "F"),
      Row("2-HIGH", "O"), Row("2-HIGH", "F"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(s"$dir/orders.parquet")

    val out = SparkEntry.queries("q42_pivot")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // every cell populated — absent combinations are 0, never null
    out shouldBe Seq(("1-URGENT", 2L, 0L, 0L), ("2-HIGH", 1L, 1L, 0L))
  }

  test("d9 and q73 run CONCURRENTLY on one session with correct results") {
    // Both queries used to mutate-and-restore the session-global shuffle-
    // partition conf (Dedup.clusterLabelsStars / drainToMemory) — racing
    // when run concurrently on one session. The overrides now live on
    // cloned sessions; prove it by racing them and comparing to the
    // sequential results.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def run(name: String): Set[String] =
      SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSet
    val seqD9 = run("d9_connected_components")
    val seqQ73 = run("q73_stream_session")
    // shared-conf canary: the session value must survive the race unchanged
    val canary = spark.conf.get("spark.sql.shuffle.partitions")
    val (concD9, concQ73) = Await.result(
      Future(run("d9_connected_components")).zip(Future(run("q73_stream_session"))),
      5.minutes)
    concD9 shouldBe seqD9
    concQ73 shouldBe seqQ73
    spark.conf.get("spark.sql.shuffle.partitions") shouldBe canary
  }

  test("q74 leaves the shared session's state-store provider untouched") {
    // the TwS processor forces RocksDB — on q74's cloned session only; a
    // later streaming query on the shared session must still get the
    // default provider (checkpoints are not portable across providers)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    SparkEntry.queries("q74_tws_sessions")(spark, sfDir).collect().length should be > 0
    spark.conf.getOption(key) shouldBe before
  }

  test("normalizeEventTs: long-nanos, ntz, and timestamp encodings all land on the same micros") {
    // The driver has shipped events.ts as TIMESTAMP(NANOS) (read as LONG
    // under nanosAsLong) and as timestamp[us] (read as TIMESTAMP_NTZ);
    // scalecurve replicas write raw epoch-nanos BIGINT. All three must
    // normalize to the same session-timezone TimestampType micros or the
    // whole events catalog silently diverges from the DuckDB oracle.
    import spark.implicits._
    val dir = tmpDir("ts_norm")
    val micros = Seq(0L, 1700000000123456L, 1700000000999999L)
    // sub-micro nanos remainder must truncate away, matching the oracle's
    // date_trunc('microseconds', ...)
    micros.zipWithIndex.map { case (us, i) => us * 1000 + i }.toDF("ts")
      .write.parquet(s"$dir/longs")
    micros.toDF("us")
      .selectExpr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts")
      .write.parquet(s"$dir/ntz")
    micros.toDF("us").selectExpr("timestamp_micros(us) AS ts")
      .write.parquet(s"$dir/tsz")
    def normed(p: String): (DataType, Seq[Long]) = {
      val df = Queries.normalizeEventTs(spark.read.parquet(p))
      (df.schema("ts").dataType,
        df.selectExpr("unix_micros(ts)").as[Long].collect().toSeq.sorted)
    }
    for (enc <- Seq("longs", "ntz", "tsz")) {
      val (dt, got) = normed(s"$dir/$enc")
      withClue(enc) {
        dt shouldBe TimestampType
        got shouldBe micros.sorted
      }
    }
  }

  test("t20: top-2-gram coverage, lexicographic tie-break, gram-less docs keep zero defaults") {
    import spark.implicits._
    val dir = tmpDir("t20_edge")
    Seq(
      (1L, "a b a b a b"), // "a b"x3, "b a"x2; n_chars=11
      (2L, "solo"),        // single token: no 2-grams -> defaults row
      (3L, "c a c b")      // three distinct grams, count 1 each -> tie,
                           // smallest gram "a c" wins
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t20_gopher_topgram")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out(1L) shouldBe (("a b", 3L,
      1000000L * 3 * 3 / 11,                  // top coverage: 3 hits x 3 chars
      1000000L * (3 * 3 + 2 * 3) / 11))       // dup mass: both repeated grams
    out(2L) shouldBe (("", 0L, 0L, 0L))
    out(3L) shouldBe (("a c", 1L, 1000000L * 3 / 7, 0L))
  }

  test("c12: likelihood-ratio weights and per-source ranks match the hand computation") {
    import spark.implicits._
    val dir = tmpDir("c12_edge")
    Seq(
      (1L, "aa aa", "en", "srcA"),  // target-heavy
      (2L, "bb bb", "de", "srcA"),  // non-target tokens only
      (3L, "aa bb", "en", "srcB")
    ).toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    // tf_s: aa=3, bb=3; target(en): aa=3, bb=1; N_s=6, N_t=4
    // w(aa) = 1e6*3*6 div (3*4) = 1_500_000; w(bb) = 1e6*1*6 div (3*4) = 500_000
    val out = SparkEntry.queries("c12_dsir_importance")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    out(1L) shouldBe (("srcA", 2L, 3000000L, 1))
    out(2L) shouldBe (("srcA", 2L, 1000000L, 2)) // outranked within its source
    out(3L) shouldBe (("srcB", 2L, 2000000L, 1))
  }

  test("c14: byte-identical duplicates land in one split; whitespace variants share a fingerprint") {
    import spark.implicits._
    val dir = tmpDir("c14_edge")
    Seq(
      (1L, "same words here"),
      (2L, "same words here"),      // exact duplicate of 1
      (3L, "same   words\there"),   // whitespace variant -> same normalized fp
      (4L, "different entirely")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("c14_leakage_safe_split")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(3), r.getLong(4), r.getLong(5))).toMap
    // docs 1-3 share one fingerprint -> one split, audit reads (3, 1)
    val fps = Seq(1L, 2L, 3L).map(out(_)._1).distinct
    fps.size shouldBe 1
    Seq(1L, 2L, 3L).map(out(_)._2).distinct.size shouldBe 1
    Seq(1L, 2L, 3L).foreach { id => out(id)._3 shouldBe 3L; out(id)._4 shouldBe 1L }
    out(4L)._1 should not be fps.head
    out(4L)._3 shouldBe 1L
    out(4L)._4 shouldBe 1L
  }
}
