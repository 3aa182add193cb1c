package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/**
 * Z-order (Morton) key: interleave the low `bits` bits of N long
 * dimensions into one long sort key — dimension d's bit i lands at
 * position `N*i + (N-1-d)` (for two dims: a's bit i at 2i+1, b's at 2i).
 * Sorting by the key places rows close in EVERY dimension into the same
 * file/row-group, so parquet min/max statistics prune scans filtered on
 * ANY dimension (a plain lexicographic sort only helps the leading
 * column). This is the layout pass a 100 TB table wants before a write:
 * cluster once, skip forever after.
 *
 * Native codegen expression (a tight bit loop) rather than an N·bits-term
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

  /** zorder_key(dims..., bits): interleaved Morton key of the dims' lows.
   *  2–8 dimensions; `bits` per dimension, `bits * n <= 63` so the key
   *  stays non-negative (the sign bit would invert sort order). */
  case class ZOrderKey(dims: Seq[Expression], bits: Int) extends Expression {
    private val n = dims.size
    require(n >= 2 && n <= 8, s"zorder_key takes 2-8 dimensions, got $n")
    require(bits >= 1 && bits * n <= 63,
      s"bits must satisfy 1 <= bits and bits*dims <= 63, got bits=$bits dims=$n")

    override def children: Seq[Expression] = dims
    override def dataType: DataType = LongType
    override def nullable: Boolean = dims.exists(_.nullable)
    override def foldable: Boolean = dims.forall(_.foldable)

    // integral-only, like the built-in bit expressions: strings / fractionals
    // must FAIL analysis, not be silently cast to NULL/truncated keys —
    // which is why the SQL builder and zkey inject no implicit Cast
    private def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (dims.forall(d => integral(d.dataType)))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects integral arguments (tinyint..bigint), got " +
          dims.map(_.dataType.simpleString).mkString("(", ", ", ")"))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(dims = newChildren)

    override def eval(input: InternalRow): Any = {
      val vals = new Array[Long](n)
      var d = 0
      while (d < n) {
        val v = dims(d).eval(input)
        if (v == null) return null
        vals(d) = v.asInstanceOf[Number].longValue // byte..long widen exactly
        d += 1
      }
      var res = 0L
      var i = 0
      while (i < bits) {
        d = 0
        while (d < n) {
          res |= ((vals(d) >> i) & 1L) << (n * i + (n - 1 - d))
          d += 1
        }
        i += 1
      }
      res
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val evals = dims.map(_.genCode(ctx))
      val i = ctx.freshName("i")
      val interleave = dims.indices.map { d =>
        s"${ev.value} |= ((${evals(d).value} >> $i) & 1L) << ($n * $i + ${n - 1 - d});"
      }.mkString("\n")
      val compute =
        s"""
           |${ev.value} = 0L;
           |for (int $i = 0; $i < $bits; $i++) {
           |$interleave
           |}
         """.stripMargin
      if (nullable) {
        val nullChecks = evals.map(_.isNull.toString).mkString(" || ")
        ev.copy(code = code"""
          |${evals.map(_.code).mkString("\n")}
          |boolean ${ev.isNull} = $nullChecks;
          |long ${ev.value} = 0L;
          |if (!${ev.isNull}) {
          |$compute
          |}
        """.stripMargin)
      } else {
        ev.copy(code = code"""
          |${evals.map(_.code).mkString("\n")}
          |long ${ev.value} = 0L;
          |$compute
        """.stripMargin, isNull = FalseLiteral)
      }
    }
  }

  /** Column API: Morton key of two dimensions' low `bits` bits.
   *  Callers are expected to pre-scale dimensions into [0, 2^bits).
   *  Integral columns only — no implicit cast, so a string or fractional
   *  column is an analysis error rather than a silently-wrong key. */
  def zkey(a: Column, b: Column, bits: Int = 16): Column =
    zkeyN(bits, a, b)

  /** N-ary Column API: `zkeyN(bits, d0, d1, ..., dn-1)` — d0 owns the most
   *  significant position of each interleave group. */
  def zkeyN(bits: Int, dims: Column*): Column =
    GraftSqlBridge.column(ZOrderKey(dims.map(GraftSqlBridge.expression), bits))

  /** The DuckDB/ANSI mirror of [[zkey]]: an unrolled OR of N·bits shifted
   *  single-bit terms over the named columns (exact integer ops — parity
   *  with the native expression is structural). */
  def duckdbSql(a: String, b: String, bits: Int = 16): String =
    duckdbSqlN(Seq(a, b), bits)

  def duckdbSqlN(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (0 until bits).flatMap(i => cols.zipWithIndex.map { case (c, d) =>
      s"((($c >> $i) & 1) << ${n * i + (n - 1 - d)})"
    }).mkString(" | ")
  }

  /** SQL builder: `zorder_key(d0, d1[, d2, ...][, bits])` — a trailing
   *  foldable INTEGER LITERAL is the per-dimension bit width (default 16,
   *  capped so bits*dims <= 63); every other argument is a dimension.
   *  This keeps the original 2-or-3-arg contract: `zorder_key(a, b, 8)`
   *  reads the literal 8 as bits, while `zorder_key(a, b, c)` (a
   *  non-literal third column) is a 3-dimension key. Shared by
   *  GraftExtensions and the runtime function registry. */
  def sqlBuilder(es: Seq[Expression]): Expression = {
    if (es.length < 2) throw new IllegalArgumentException(
      s"zorder_key expects at least 2 dimension arguments, got ${es.length}")
    val trailingBits: Option[Int] = es.last match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal
          if es.length > 2 && (lit.dataType == IntegerType || lit.dataType == LongType) =>
        lit.value match {
          case i: Int => Some(i)
          case l: Long => Some(l.toInt)
          case _ => None
        }
      case _ => None
    }
    val dims = if (trailingBits.isDefined) es.dropRight(1) else es
    val bits = trailingBits.getOrElse(math.min(16, 63 / dims.length))
    // no implicit Cast: ZOrderKey accepts any integral type itself, and
    // anything else must reach checkInputDataTypes as an analysis error
    // (an unconditional Cast to LONG would mask bad input as NULL keys)
    ZOrderKey(dims, bits)
  }
}
