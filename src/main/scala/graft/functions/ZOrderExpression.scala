package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/**
 * Z-order (Morton) key: interleave the low `bits` bits of two long
 * dimensions into one long sort key — `a`'s bit i lands at position 2i+1,
 * `b`'s at 2i. Sorting by the key places rows close in BOTH dimensions
 * into the same file/row-group, so parquet min/max statistics prune scans
 * filtered on EITHER dimension (a plain lexicographic sort only helps the
 * leading column). This is the layout pass a 100 TB table wants before a
 * write: cluster once, skip forever after.
 *
 * Native codegen expression (a tight bit loop) rather than a 2·bits-term
 * SQL expression tree: the unrolled tree is what the DuckDB oracle runs
 * (bit ops are exact, so parity is structural, not numeric), but on the
 * Spark side it would bloat janino compile time the same way the
 * element_at trees did for vectors (see VectorExpressions).
 *
 * No reference counterpart (the reference has no storage-layout
 * operators); pattern follows Delta/Iceberg Z-ordering as published in
 * their open-source compaction implementations.
 */
object ZOrderExpression {

  /** zorder_key(a, b, bits): interleaved Morton key of the two lows. */
  case class ZOrderKey(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    // integral-only, like the built-in bit expressions: strings / fractionals
    // must FAIL analysis, not be silently cast to NULL/truncated keys —
    // which is why the SQL builder and zkey inject no implicit Cast
    private def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (integral(left.dataType) && integral(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects integral arguments (tinyint..bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[Number].longValue // byte..long all widen exactly
      val b = r.asInstanceOf[Number].longValue
      var res = 0L
      var i = 0
      while (i < bits) {
        res |= ((a >> i) & 1L) << (2 * i + 1)
        res |= ((b >> i) & 1L) << (2 * i)
        i += 1
      }
      res
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        s"""
           |${ev.value} = 0L;
           |for (int $i = 0; $i < $bits; $i++) {
           |  ${ev.value} |= (($a >> $i) & 1L) << (2 * $i + 1);
           |  ${ev.value} |= (($b >> $i) & 1L) << (2 * $i);
           |}
         """.stripMargin
      })
  }

  /** Column API: Morton key of the two dimensions' low `bits` bits.
   *  Callers are expected to pre-scale dimensions into [0, 2^bits).
   *  Integral columns only — no implicit cast, so a string or fractional
   *  column is an analysis error rather than a silently-wrong key. */
  def zkey(a: Column, b: Column, bits: Int = 16): Column =
    GraftSqlBridge.column(ZOrderKey(
      GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b), bits))

  /** The DuckDB/ANSI mirror of [[zkey]]: an unrolled OR of 2·bits shifted
   *  single-bit terms over columns `a`/`b` (exact integer ops — parity with
   *  the native expression is structural). */
  def duckdbSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) | ((($b >> $i) & 1) << ${2 * i})")
      .mkString(" | ")
}
