package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Unit-normalize a float/double vector in ONE native pass.
  *
  * The SQL form (`transform(v, x -> x / sqrt(aggregate(v, ...)))`) hits
  * the multiply-referenced-projection pitfall this repo documents: the
  * optimizer inlines the norm aggregate into the lambda body and
  * re-evaluates the full sum of squares once per element — O(d²) per
  * row. This expression computes the norm once and divides once, O(d),
  * with no lambda for the optimizer to inline into.
  *
  * Bit-parity contract (same as [[VectorDot]]): the sum of squares is
  * the ascending sequential double fold, then each element is divided
  * by `sqrt(sum)` — identical operations and order to the SQL
  * formulation the DuckDB oracle mirrors, so downstream cosines are
  * bit-identical. A zero vector yields NaNs, same as the SQL form.
  */
case class VecNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_normalize expects array<float|double>, got ${t.simpleString}")
  }

  override def nullable: Boolean = true // null element ⇒ null result

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val d = new Array[Double](n)
    var i = 0
    // registered SQL fn, arbitrary arrays: a null element has no
    // defined direction — yield NULL rather than reading garbage
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    i = 0
    if (isFloat) while (i < n) { d(i) = x.getFloat(i).toDouble; i += 1 }
    else while (i < n) { d(i) = x.getDouble(i); i += 1 }
    var acc = 0.0
    i = 0
    while (i < n) { acc += d(i) * d(i); i += 1 }
    val nrm = math.sqrt(acc)
    i = 0
    while (i < n) { d(i) = d(i) / nrm; i += 1 }
    new GenericArrayData(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      val arr = ctx.freshName("arr")
      val get = if (isFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      s"""
         |int $n = $a.numElements();
         |double[] $arr = new double[$n];
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $arr[$i] = $get($i);
         |}
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) { $acc += $arr[$i] * $arr[$i]; }
         |  double $nrm = java.lang.Math.sqrt($acc);
         |  for (int $i = 0; $i < $n; $i++) { $arr[$i] /= $nrm; }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNormalize =
    copy(child = c)
}

object VecNormalize {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_normalize", exprs => VecNormalize(exprs.head), "built-in")
}
