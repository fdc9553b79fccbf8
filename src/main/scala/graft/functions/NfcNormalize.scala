package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * first text-cleanup step of any multilingual corpus pipeline: the
  * same visible string arrives both precomposed ("é" U+00E9) and
  * decomposed ("e" + U+0301) from different crawls/OCR, and every
  * downstream equality — exact dedup fingerprints, shingle sets,
  * blocklists — silently misses across the two encodings until forms
  * are canonicalized. Spark ships no normalization builtin; a Scala
  * UDF would hide the call from codegen, so this wraps
  * `java.text.Normalizer` (JDK-public, the canonical implementation)
  * as a UnaryExpression with both interpreted and generated paths.
  * DuckDB's `nfc_normalize` implements the same Unicode algorithm —
  * verified byte-identical (q_normalize's md5 gate). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs(0)), "built-in")
}

/** Accent stripping by canonical decomposition: NFD then drop every
  * combining mark (Unicode category Mn) — "café" and "cafe" become one
  * search/dedup key. This is the NFD+Mn definition (exactly what the
  * decomposition standard gives); engine-specific `strip_accents`
  * tables can differ on NON-decomposable letters (ø, đ), so gates pin
  * inputs to canonically-decomposable accents where every
  * implementation agrees. Codegen'd static calls, no UDF. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(StripAccents.strip(
      s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.StripAccents.strip($c.toString()));"""
        .stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): StripAccents = copy(child = newChild)
}

object StripAccents {
  // compiled once per JVM, not per row — String.replaceAll would
  // recompile the pattern on every invocation in both eval paths
  private val Mn = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** NFD + drop Mn (shared by interpreted and generated paths). */
  def strip(s: String): String =
    Mn.matcher(java.text.Normalizer.normalize(
      s, java.text.Normalizer.Form.NFD)).replaceAll("")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_accents", exprs => StripAccents(exprs(0)), "built-in")
}
