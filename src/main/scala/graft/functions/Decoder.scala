package graft.functions

import org.apache.spark.sql.SparkSession

/**
 * System UDFs: binary decode + COMP-3 (IBM packed-decimal) support.
 *
 * Reference: functions/Decoder.scala (bytes_to_hex :14-28, bytes_to_string
 * :33-37, com3_to_double :42-49, com3_to_int :54-61) and
 * functions/BinarySplitter.scala:14-37 (binary_split). Implementations are
 * written from the public COMP-3 format description (low nibble of last
 * byte = sign: 0xC/0xF positive, 0xD negative; each other nibble a decimal
 * digit), not copied.
 */
object Decoder {

  def bytesToHex(bytes: Array[Byte]): String =
    if (bytes == null) null else bytes.map(b => f"$b%02x").mkString

  def bytesToString(bytes: Array[Byte], charset: String): String =
    if (bytes == null) null else new String(bytes, charset)

  /** Packed-decimal (COMP-3) → unscaled Long. Throws on invalid nibbles. */
  private def comp3Unscaled(bytes: Array[Byte]): (Long, Int) = {
    var value = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val hi = b >> 4
      val lo = b & 0x0f
      require(hi <= 9, s"invalid COMP-3 digit nibble: $hi")
      value = value * 10 + hi
      if (i == bytes.length - 1) {
        // last low nibble is the sign
        require(lo >= 0x0a, s"invalid COMP-3 sign nibble: $lo")
      } else {
        require(lo <= 9, s"invalid COMP-3 digit nibble: $lo")
        value = value * 10 + lo
      }
      i += 1
    }
    // packed-decimal sign nibbles: 0xB and 0xD are negative; A/C/E/F positive
    val signNibble = bytes(bytes.length - 1) & 0x0f
    val sign = if (signNibble == 0x0d || signNibble == 0x0b) -1 else 1
    (value, sign)
  }

  def com3ToDouble(bytes: Array[Byte], scale: Int): Double = {
    if (bytes == null || bytes.isEmpty) return 0.0
    val (v, sign) = comp3Unscaled(bytes)
    sign * v / math.pow(10, scale)
  }

  def com3ToInt(bytes: Array[Byte]): Int = {
    if (bytes == null || bytes.isEmpty) return 0
    val (v, sign) = comp3Unscaled(bytes)
    (sign * v).toInt
  }

  /** Split a byte array on a byte-sequence delimiter
   *  (reference: functions/BinarySplitter.scala:14-37). */
  def binarySplit(bytes: Array[Byte], delimiter: Array[Byte]): Array[Array[Byte]] = {
    if (bytes == null) return null
    if (delimiter == null || delimiter.isEmpty) return Array(bytes)
    val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var start = 0
    var i = 0
    while (i <= bytes.length - delimiter.length) {
      var j = 0
      while (j < delimiter.length && bytes(i + j) == delimiter(j)) j += 1
      if (j == delimiter.length) {
        parts += java.util.Arrays.copyOfRange(bytes, start, i)
        i += delimiter.length
        start = i
      } else i += 1
    }
    parts += java.util.Arrays.copyOfRange(bytes, start, bytes.length)
    parts.toArray
  }
}

/**
 * Registry for the system UDFs, auto-invoked per session
 * (reference: common/UdfRegister.scala:24-36; docs/system-udfs.md), plus the
 * custom-UDF registration hook (`UdfRegister.register(prefix)`,
 * common/UdfRegister.scala:8-17).
 */
object UdfRegistry {
  import org.apache.spark.sql.functions.udf

  /** Contract for user-supplied UDF bundles registered per pipeline. */
  trait UdfProvider { def register(prefix: String, spark: SparkSession): Unit }

  def registerSystemUdfs(spark: SparkSession): Unit = {
    spark.udf.register("bytes_to_hex", udf((b: Array[Byte]) => Decoder.bytesToHex(b)))
    spark.udf.register("bytes_to_string",
      udf((b: Array[Byte], cs: String) => Decoder.bytesToString(b, cs)))
    spark.udf.register("com3_to_double",
      udf((b: Array[Byte], scale: Int) => Decoder.com3ToDouble(b, scale)))
    spark.udf.register("com3_to_int", udf((b: Array[Byte]) => Decoder.com3ToInt(b)))
    spark.udf.register("binary_split",
      udf((b: Array[Byte], d: Array[Byte]) => Decoder.binarySplit(b, d)))
    // native codegen'd vector expressions, exposed to SQL
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "vec_dot",
      es => VectorExpressions.ArrayDotProduct(es(0), es(1)))
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "vec_norm",
      es => VectorExpressions.ArrayL2Norm(es.head))
    // mergeable sketch aggregates (HyperLogLog distinct, KLL quantiles)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_hll",
      SketchAggregates.hllBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_kll",
      SketchAggregates.kllBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_hll_state",
      SketchAggregates.hllStateBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_hll_merge",
      SketchAggregates.hllMergeBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_kll_state",
      SketchAggregates.kllStateBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_kll_merge",
      SketchAggregates.kllMergeBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_bloom_state",
      SketchAggregates.bloomStateBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_bloom_merge",
      SketchAggregates.bloomMergeBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_bloom_contains",
      SketchAggregates.bloomContainsBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_cms_state",
      SketchAggregates.cmsStateBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_cms_merge",
      SketchAggregates.cmsMergeBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_cms_count",
      SketchAggregates.cmsCountBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_bottomk",
      SketchAggregates.bottomKBuilder)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "graft_topk_pairs",
      SketchAggregates.topKPairsBuilder)
    // N-ary Z-order key (trailing integer literal = per-dim bits)
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, "zorder_key",
      ZOrderExpression.sqlBuilder)
    // HOF-vector-math -> native-expression optimizer rewrite (idempotent add)
    if (!spark.experimental.extraOptimizations.contains(VectorRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VectorRewriteRule
  }

  /** Instantiate a UdfProvider by class name and register under prefix. */
  def register(className: String, prefix: String)(implicit spark: SparkSession): Unit =
    Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[UdfProvider].register(prefix, spark)
}
