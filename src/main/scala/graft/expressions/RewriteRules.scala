package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType, ArrayType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * into the native codegen'd [[DotProduct]]. The HOF form evaluates
  * interpreted (one boxed lambda call per element) and allocates the
  * zipped intermediate array; the rewrite makes the idiom run as a
  * compiled loop — users writing plain `functions` code get the native
  * expression automatically.
  *
  * Semantics preserved exactly: IEEE multiplication/addition of the same
  * operands in the same order (commutative forms accepted — IEEE `*`/`+`
  * are commutative, just not associative), null array → null, null
  * element → null, length mismatch (ZipWith null-pads → null product →
  * null sum) → null. The rewrite fires only on the exact shape with a
  * literal 0.0 seed and an identity finish lambda.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  /** The multiply operand must be the lambda var itself (already double)
    * or a double-cast of it. */
  private def isVarAsDouble(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case c: Cast if c.dataType == DoubleType => sameVar(c.child, v)
      case other => sameVar(other, v)
    }

  private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(m: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(ad: Add,
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if isFloatOrDoubleArray(a) && isFloatOrDoubleArray(b) &&
            ((isVarAsDouble(m.left, x) && isVarAsDouble(m.right, y)) ||
             (isVarAsDouble(m.left, y) && isVarAsDouble(m.right, x))) &&
            ((sameVar(ad.left, acc) && sameVar(ad.right, el)) ||
             (sameVar(ad.left, el) && sameVar(ad.right, acc))) &&
            sameVar(fin, fv) =>
        DotProduct(a, b)
    }
}
