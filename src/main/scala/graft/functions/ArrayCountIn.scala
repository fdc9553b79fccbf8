package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multiplicity-preserving membership count: how many elements of an
  * array<string> column appear in a FIXED word list (the second, foldable
  * argument) — `array_count_in(toks, array('the','a',...))`.
  *
  * The declarative forms are all interpreted per element:
  * `size(filter(toks, t -> t IN (...)))` and the equivalent `aggregate`
  * run the lambda through the non-codegen higher-order-function
  * interpreter, boxing every token (measured as the second-hottest text
  * query at sf0.1). `array_intersect` is codegen'd but set-valued — it
  * drops duplicate tokens, and stopword COUNTS need multiplicity. This
  * expression hashes the word list once per task and counts with a tight
  * generated loop: O(tokens) probes, zero allocation per row.
  *
  * Null semantics match `size(filter(toks, t.isin(words...)))`: a null
  * array yields null; null elements never count (IN over a null token is
  * null, which `filter` treats as false).
  */
case class ArrayCountIn(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def strArr(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!strArr(left.dataType) || !strArr(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"array_count_in expects array<string> args, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "array_count_in expects a foldable word list as its second argument")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** The word set, built once (per task under codegen, per expression
    * tree interpreted) from the foldable list argument. */
  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        // clone: literal buffers are stable, but don't depend on it
        if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).clone())
        i += 1
      }
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0; var c = 0L
    while (i < n) {
      if (!x.isNullAt(i) && wordSet.contains(x.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements(); long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCountIn =
    copy(left = newLeft, right = newRight)
}

object ArrayCountIn {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_count_in",
      exprs => ArrayCountIn(exprs(0), exprs(1)), "built-in")
}
