package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the idiomatic SQL-fold dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) }}}
  *
  * and replace it with the native [[VectorDot]] loop — the
  * whole-operator analogue of preferring `functions._` over UDFs: users
  * write the declarative fold, the plan runs the codegen'd expression.
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`), so it
  * applies session-wide to arbitrary user plans, not just graft's own.
  *
  * Soundness: [[VectorDot]] implements the fold's exact semantics —
  * same ascending sequential double summation (bit-identical result),
  * NULL on null elements or length mismatch (how zip_with null-padding
  * propagates through `+`) — so the rewrite never changes a value. It
  * fires only on the exact shape: double-element arrays, a bare (or
  * double-cast) `x*y` zip lambda, a bare `acc+v` merge, an identity
  * finish, and a literal +0.0 seed (bit-checked: a -0.0 seed can
  * surface as -0.0 on empty arrays, which VectorDot would not).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripDoubleCast(c)
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripDoubleCast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(add: Add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
          if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
            isDoubleArray(a) && isDoubleArray(b) &&
            ((isVar(mul.left, x) && isVar(mul.right, y)) ||
             (isVar(mul.left, y) && isVar(mul.right, x))) &&
            ((isVar(add.left, acc) && isVar(add.right, v)) ||
             (isVar(add.left, v) && isVar(add.right, acc))) &&
            isVar(fin, facc) =>
        VectorDot(a, b)
    }
}
