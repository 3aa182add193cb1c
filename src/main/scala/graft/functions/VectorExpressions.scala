package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector-similarity hot path: a dot
 * product and an L2 norm over `array<float|double>` columns, with
 * whole-stage-codegen loops.
 *
 * Why: the equivalent `aggregate(zip_with(...))` higher-order fold is
 * interpreted (one closure call + boxing per element per row), and an
 * explicit 64-term `element_at` tree blows up janino compile time. A tight
 * generated `for` loop is both. Accumulation is left-to-right in double —
 * bit-identical to the fold and to a left-assoc SQL sum, so DuckDB-oracle
 * hash parity is preserved.
 */
object VectorExpressions {

  private def elemKind(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vector expression expects array<float|double>, got ${other.simpleString}")
  }

  /** dot(a, b) = Σ a_i·b_i, null if any element is null; pairs truncate at
   *  the shorter length (inputs are expected equal-length). */
  case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val aF = elemKind(left); val bF = elemKind(right)
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val aGet = if (elemKind(left)) s"(double) $a.getFloat" else s"$a.getDouble"
        val bGet = if (elemKind(right)) s"(double) $b.getFloat" else s"$b.getDouble"
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $acc += $aGet($i) * $bGet($i);
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })
  }

  /** |a| = sqrt(Σ a_i²), null if any element is null. */
  case class ArrayL2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override protected def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val aF = elemKind(child)
      val n = a.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        acc += x * x
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val aGet = if (elemKind(child)) s"(double) $a.getFloat" else s"$a.getDouble"
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val x = ctx.freshName("x")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $x = $aGet($i);
           |  $acc += $x * $x;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
           |""".stripMargin
      })
  }

  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def l2Norm(a: Column): Column =
    GraftSqlBridge.column(ArrayL2Norm(GraftSqlBridge.expression(a)))
}
