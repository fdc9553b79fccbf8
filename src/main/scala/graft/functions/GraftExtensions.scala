package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for graft's native expressions, so a
  * deployment can enable them cluster-wide:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * (Per-session registration via [[VectorDot.register]] remains for
  * library callers that don't control session construction.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Rule[LogicalPlan]: rewrite the declarative SQL-fold dot product
    // into the native VectorDot loop wherever it appears in a plan.
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // ...and the idiomatic size(filter(arr, x -> x IN (...))) membership
    // count into the native ArrayCountIn probe.
    ext.injectOptimizerRule(_ => ArrayCountInRewrite)
    // Rule[LogicalPlan]: transparent materialized-view rollup rewrite
    // (no-op until graft.ops.MatViews.create registers a summary).
    ext.injectOptimizerRule(_ => graft.ops.MvRollupRule)
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_normalize"),
      new ExpressionInfo(classOf[VecNormalize].getName, "vec_normalize"),
      (exprs: Seq[Expression]) => VecNormalize(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_lsh"),
      new ExpressionInfo(classOf[HyperplaneLsh].getName, "hyperplane_lsh"),
      HyperplaneLsh.fromExprs))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("array_count_in"),
      new ExpressionInfo(classOf[ArrayCountIn].getName, "array_count_in"),
      (exprs: Seq[Expression]) => ArrayCountIn(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinklerSim(exprs(0), exprs(1))))
  }
}
