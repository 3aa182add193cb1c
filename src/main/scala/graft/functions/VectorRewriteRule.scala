package graft.functions

import graft.functions.VectorExpressions.{ArrayDotProduct, ArrayL2Norm}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/**
 * Optimizer rule: rewrite interpreted higher-order-function vector math to
 * the native codegen'd expressions —
 *
 *  - `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)`
 *    → [[ArrayDotProduct]](a, b)
 *  - `sqrt(aggregate(a, 0.0d, (acc, x) -> acc + x * x))` → [[ArrayL2Norm]](a)
 *
 * The HOF forms evaluate one closure call + boxed element per array entry
 * per row and never enter whole-stage codegen (~10x slower at dim=64); the
 * natives are tight generated loops with identical left-to-right double
 * accumulation, so VALUES are bit-identical. Null semantics differ only
 * for ragged pairs: `zip_with` null-pads the shorter array (fold → NULL)
 * while the native truncates — equal-length vectors (the embedding-column
 * contract) are unaffected. Disable with
 * `spark.graft.vectorRewrite.enabled=false`.
 *
 * Install via `spark.experimental.extraOptimizations` (done by
 * `UdfRegistry.registerSystemUdfs`) or `GraftExtensions`
 * (`spark.sql.extensions`).
 */
object VectorRewriteRule extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => stripCast(c.child)
    case other => other
  }

  private def lambdaVar(e: Expression): Option[NamedLambdaVariable] = stripCast(e) match {
    case v: NamedLambdaVariable => Some(v)
    case _ => None
  }

  /** The HOF multiplies in the OPERAND type; the native always widens to
   *  double first. Results are identical only when the HOF product is also
   *  computed in double — i.e. the operand is an explicit double cast, or
   *  the element itself is double. Raw float*float would round to float
   *  first, so such lambdas must NOT be rewritten. */
  private def doubleOperand(e: Expression): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => lambdaVar(c.child).isDefined
    case v: NamedLambdaVariable => v.dataType == DoubleType
    case _ => false
  }

  private def isVector(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** (x, y) -> x * y over exactly the two lambda arguments, with the
   *  product computed in double precision. */
  private def isElementProduct(lf: LambdaFunction): Boolean = lf.arguments match {
    case Seq(x: NamedLambdaVariable, y: NamedLambdaVariable) =>
      stripCast(lf.function) match {
        case m: Multiply if doubleOperand(m.left) && doubleOperand(m.right) =>
          (lambdaVar(m.left), lambdaVar(m.right)) match {
            case (Some(a), Some(b)) => Set(a.exprId, b.exprId) == Set(x.exprId, y.exprId)
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  /** (acc, v) -> acc + v. */
  private def isSumMerge(lf: LambdaFunction): Boolean = lf.arguments match {
    case Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable) =>
      stripCast(lf.function) match {
        case a: Add => (lambdaVar(a.left), lambdaVar(a.right)) match {
          case (Some(l), Some(r)) => l.exprId == acc.exprId && r.exprId == el.exprId
          case _ => false
        }
        case _ => false
      }
    case _ => false
  }

  /** (acc, x) -> acc + x * x, square computed in double precision. */
  private def isSquareSumMerge(lf: LambdaFunction): Boolean = lf.arguments match {
    case Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable) =>
      stripCast(lf.function) match {
        case a: Add =>
          val accOk = lambdaVar(a.left).exists(_.exprId == acc.exprId)
          stripCast(a.right) match {
            case m: Multiply if doubleOperand(m.left) && doubleOperand(m.right) =>
              accOk && lambdaVar(m.left).exists(_.exprId == el.exprId) &&
                lambdaVar(m.right).exists(_.exprId == el.exprId)
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  /** acc -> acc (the implicit finish lambda of 3-arg aggregate). */
  private def isIdentity(lf: LambdaFunction): Boolean = lf.arguments match {
    case Seq(acc: NamedLambdaVariable) =>
      lambdaVar(lf.function).exists(_.exprId == acc.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.vectorRewrite.enabled", "true").toBoolean) plan
    else plan.transformAllExpressions {
      case ArrayAggregate(zw: ZipWith, zero, merge: LambdaFunction, finish: LambdaFunction)
          if isZeroDouble(zero) && isSumMerge(merge) && isIdentity(finish) &&
            (zw.function match { case lf: LambdaFunction => isElementProduct(lf); case _ => false }) &&
            isVector(zw.left) && isVector(zw.right) =>
        ArrayDotProduct(zw.left, zw.right)
      case Sqrt(ArrayAggregate(arg, zero, merge: LambdaFunction, finish: LambdaFunction))
          if isZeroDouble(zero) && isSquareSumMerge(merge) && isIdentity(finish) &&
            isVector(arg) =>
        ArrayL2Norm(arg)
    }
}
