package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  ArrayFilter, Cast, CreateArray, In, LambdaFunction, NamedLambdaVariable,
  Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Optimizer rule: recognize the idiomatic membership count
  *
  * {{{ size(filter(toks, t -> t IN ('the', 'a', ...))) }}}
  *
  * and replace it with the native [[ArrayCountIn]] probe (hash set built
  * once per task, tight codegen'd loop) — the `filter` lambda runs
  * through the interpreted higher-order-function evaluator and boxes
  * every element. Injected via [[GraftExtensions]], so any user plan
  * gets the rewrite, not just graft's own queries (same contract as
  * [[DotProductRewrite]]).
  *
  * Soundness: fires only on the exact shape — array<string> input, the
  * lambda variable itself (no casts) tested by a non-empty `IN` of
  * foldable string values, and non-legacy `size` semantics
  * (legacySizeOfNull=true maps null→-1, which ArrayCountIn does not).
  * Null parity holds by construction: null array → null both ways; a
  * null ELEMENT makes `IN` yield null, which `filter` treats as drop —
  * exactly ArrayCountIn's skip; null literals in the word list never
  * match in either form. The cast back to int mirrors `size`'s type.
  * Asserted value-by-value (null-sensitively) in ExtensionsSpec.
  */
object ArrayCountInRewrite extends Rule[LogicalPlan] {

  private def isStringArray(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayFilter(arr,
            LambdaFunction(In(v: NamedLambdaVariable, list),
              Seq(x: NamedLambdaVariable), _)), false)
          if v.exprId == x.exprId && isStringArray(arr) && list.nonEmpty &&
            list.forall(l => l.foldable && l.dataType == StringType) =>
        Cast(ArrayCountIn(arr, CreateArray(list)), IntegerType)
    }
}
