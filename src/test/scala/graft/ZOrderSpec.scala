package graft

import graft.functions.ZOrderExpression
import org.apache.spark.sql.functions._

/**
 * Z-order layout: expression semantics (eval + codegen + SQL registration)
 * and the actual data-skipping effect — a z-ordered file layout must let
 * min/max file statistics prune a non-leading-column range filter that a
 * lexicographic layout cannot.
 */
class ZOrderSpec extends SparkSpec {

  test("zorder_key interleaves bits (eval, codegen, and SQL paths agree)") {
    import spark.implicits._
    // a=3 (0b0011) -> odd positions 1,3; b=5 (0b0101) -> even positions 0,4
    // => 0b11011 = 27
    val df = Seq((3L, 5L)).toDF("a", "b")
    val viaColumn = df.select(ZOrderExpression.zkey($"a", $"b", 4)).head.getLong(0)
    viaColumn shouldBe 27L

    // codegen path on a bigger frame (forces whole-stage codegen), checked
    // against the interpreted eval via a literal recompute
    val keys = spark.range(0, 1000)
      .select(ZOrderExpression.zkey(col("id") % 32, col("id") % 17, 8).as("k"),
        (col("id") % 32).as("a"), (col("id") % 17).as("b"))
      .collect()
    keys.foreach { r =>
      val (a, b) = (r.getLong(1), r.getLong(2))
      var exp = 0L
      for (i <- 0 until 8) {
        exp |= ((a >> i) & 1L) << (2 * i + 1)
        exp |= ((b >> i) & 1L) << (2 * i)
      }
      r.getLong(0) shouldBe exp
    }

    // SQL registration via GraftExtensions' injected builder
    // int literals are accepted natively (integral widening, no Cast)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "zorder_key",
      es => ZOrderExpression.ZOrderKey(Seq(es(0), es(1)), 4))
    spark.sql("SELECT zorder_key(3, 5)").head.getLong(0) shouldBe 27L
  }

  test("z-ordered layout prunes files on the non-leading dimension; lexicographic does not") {
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("a"),
        col("l_suppkey").cast("long").as("b"))
    // normalize both dimensions into the full 16-bit key domain (as the z1
    // catalog query does) — with raw values the narrower column's high
    // bits are constant and the key degenerates to a sort on the wider one
    val mx = raw.agg(max(col("a")), max(col("b"))).head()
    val (am, bm) = (mx.getLong(0), mx.getLong(1))
    val li = raw.withColumn("an", expr(s"a * 65535L div $am"))
      .withColumn("bn", expr(s"b * 65535L div $bm"))

    def fileRanges(path: String): Seq[(Long, Long)] = {
      // per-file min/max of b — what parquet footer stats give the scanner
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    }

    val dir = tmpDir("zorder")
    // lexicographic: range-partition + sort by (a, b) — b is unclustered
    li.drop("an", "bn")
      .repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions(col("a"), col("b"))
      .write.mode("overwrite").parquet(s"$dir/lex")
    // z-ordered: range-partition + sort by the interleaved key
    li.withColumn("z", ZOrderExpression.zkey(col("an"), col("bn"), 16))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z", "an", "bn")
      .write.mode("overwrite").parquet(s"$dir/zord")

    // a selective range filter on b (the NON-leading dimension for lex):
    // a ~10% slice of b's domain, derived from the data so the test holds
    // at any scale factor
    val (bLo, bHi) = (bm * 45 / 100, bm * 55 / 100)
    def hit(ranges: Seq[(Long, Long)]): Int =
      ranges.count { case (lo, hi) => hi >= bLo && lo <= bHi }

    val lexHits = hit(fileRanges(s"$dir/lex"))
    val zHits = hit(fileRanges(s"$dir/zord"))
    // lexicographic layout: b spans nearly its full domain in every file ->
    // no file can be skipped; z-order clusters b too -> most files skip.
    // The exact z hit count depends on range-partition file boundaries
    // (16 files ~ a 4x4 tile grid -> a 10% b-slice touches ~6-8 files), so
    // assert the skipping effect with margin rather than a boundary-exact
    // count.
    lexHits shouldBe 16
    zHits should be <= 10
    zHits should be < lexHits

    // and the filtered results agree, skipping or not
    val expected = raw.filter(col("b").between(bLo, bHi)).count()
    spark.read.parquet(s"$dir/zord").filter(col("b").between(bLo, bHi)).count() shouldBe expected
  }

  test("3-dim zorder_key: eval/codegen agree and SQL disambiguates trailing bits vs third dim") {
    import spark.implicits._
    // a=1 (bit0), b=2 (bit1), c=4 (bit2), 3 bits each: dim0 owns the TOP
    // position of each 3-bit group — recompute manually against eval
    val keys = spark.range(0, 500)
      .select(ZOrderExpression.zkeyN(6, col("id") % 32, col("id") % 17, col("id") % 11).as("k"),
        (col("id") % 32).as("a"), (col("id") % 17).as("b"), (col("id") % 11).as("c"))
      .collect()
    keys.foreach { r =>
      val (a, b, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      var exp = 0L
      for (i <- 0 until 6) {
        exp |= ((a >> i) & 1L) << (3 * i + 2)
        exp |= ((b >> i) & 1L) << (3 * i + 1)
        exp |= ((c >> i) & 1L) << (3 * i)
      }
      withClue(s"a=$a b=$b c=$c") { r.getLong(0) shouldBe exp }
    }
    // SQL via the shared builder (what GraftExtensions and the registry
    // inject): a trailing INTEGER LITERAL is bits, a trailing column is a
    // third dimension
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "zorder_key",
      ZOrderExpression.sqlBuilder)
    Seq((3L, 5L, 1L)).toDF("a", "b", "c").createOrReplaceTempView("z3_in")
    // zorder_key(a, b, 4): literal 4 = bits -> 2-dim key of (3,5) = 27
    spark.sql("SELECT zorder_key(a, b, 4) AS k FROM z3_in").head.getLong(0) shouldBe 27L
    // zorder_key(a, b, c): three dims; a=3,b=5,c=1 with default bits
    // min(16, 63/3)=16: group i holds a's bit at 3i+2, b's at 3i+1, c's at 3i
    val k3 = spark.sql("SELECT zorder_key(a, b, c) AS k FROM z3_in").head.getLong(0)
    var exp3 = 0L
    for (i <- 0 until 16) {
      exp3 |= ((3L >> i) & 1L) << (3 * i + 2)
      exp3 |= ((5L >> i) & 1L) << (3 * i + 1)
      exp3 |= ((1L >> i) & 1L) << (3 * i)
    }
    k3 shouldBe exp3
  }

  test("3-dim z-order layout prunes files on BOTH non-leading dimensions") {
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("a"),
        col("l_suppkey").cast("long").as("b"),
        col("l_orderkey").cast("long").as("c"))
    val mx = raw.agg(max(col("a")), max(col("b")), max(col("c"))).head()
    val (am, bm, cm) = (mx.getLong(0), mx.getLong(1), mx.getLong(2))
    val li = raw.withColumn("an", expr(s"a * 1023L div $am"))
      .withColumn("bn", expr(s"b * 1023L div $bm"))
      .withColumn("cn", expr(s"c * 1023L div $cm"))

    def fileRanges(path: String, dim: String): Seq[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min(col(dim)).as("lo"), max(col(dim)).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

    val dir = tmpDir("zorder3")
    li.drop("an", "bn", "cn")
      .repartitionByRange(32, col("a"), col("b"), col("c"))
      .sortWithinPartitions(col("a"), col("b"), col("c"))
      .write.mode("overwrite").parquet(s"$dir/lex")
    li.withColumn("z", ZOrderExpression.zkeyN(10, col("an"), col("bn"), col("cn")))
      .repartitionByRange(32, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z", "an", "bn", "cn")
      .write.mode("overwrite").parquet(s"$dir/zord")

    // ~8% slices of the b and c domains — both NON-leading for the
    // lexicographic layout, so its files span nearly the full domain of
    // each and none skip. 32 z-ordered files carve ~5 top key bits =
    // 1-2 bits PER dimension, so the slice must sit inside one
    // half/quarter of a dimension's domain rather than straddling the
    // single split point (a mid-domain slice would touch both halves of
    // a 1-bit dimension and hit every file — not a layout failure, just
    // slice placement). 56-64% sits in the upper half / third quarter.
    for ((dim, dm) <- Seq(("b", bm), ("c", cm))) {
      val (lo, hi) = (dm * 56 / 100, dm * 64 / 100)
      def hit(ranges: Seq[(Long, Long)]): Int =
        ranges.count { case (l, h) => h >= lo && l <= hi }
      val lexHits = hit(fileRanges(s"$dir/lex", dim))
      val zHits = hit(fileRanges(s"$dir/zord", dim))
      withClue(s"dim=$dim") {
        lexHits shouldBe 32
        zHits should be < lexHits
        zHits should be <= 24
      }
      val expected = raw.filter(col(dim).between(lo, hi)).count()
      spark.read.parquet(s"$dir/zord")
        .filter(col(dim).between(lo, hi)).count() shouldBe expected
    }
  }
}
