package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization rule-set (SURVEY §2.5 #66d') — the crawl-dedup
  * key, shared VERBATIM (rule by rule) with the DuckDB oracle SQL:
  *
  *  1. fragment stripped (text after the first `#`);
  *  2. scheme-relative remainder = everything after the FIRST `//`
  *     (a bounded parse — `split_part(url,'//',2)` would truncate any
  *     URL whose path/query contains another `//`: redirect params,
  *     protocol-relative refs, `/a//b` paths); no `//` → whole string;
  *  3. userinfo (`user:pass@`) stripped from the authority, host
  *     lowercased, default ports `:443`/`:80` stripped, leading
  *     `www.` stripped, IDN hosts punycoded;
  *  4. percent-encoding normalized per RFC 3986 §6.2.2: a `%XX`
  *     triplet whose octet is UNRESERVED (ALPHA / DIGIT / `-._~`)
  *     decodes to the bare character, any other valid triplet keeps
  *     its encoding with UPPERCASED hex, a `%` not followed by two hex
  *     digits passes through literally — reserved octets stay encoded,
  *     so decoding never introduces new path/query structure;
  *  5. scheme normalized to `https` (the upgrade-canonical choice);
  *  6. trailing path slashes removed (bare host → `/`);
  *  7. `utm_*` tracking params dropped, remaining params SORTED
  *     (binary order — ASCII-identical across engines).
  *
  * Implemented as native codegen'd expressions rather than composed
  * `Column` math: the rule-set references each parse stage many times,
  * and Catalyst `Column` trees duplicate subtrees per reference —
  * the composed form measured ~50k expression nodes for ONE
  * application and OOM'd the optimizer when composed with itself
  * (the idempotence gate canon(canon(u))). One expression node keeps
  * optimization O(1) and the whole computation inside whole-stage
  * codegen — the same rationale as [[NfcNormalize]].
  *
  * Idempotence (canon(canon(u)) == canon(u)) is asserted in
  * QueriesSpec over both handcrafted edges and the graded corpus.
  */
object UrlCanon {

  private def stripFragment(u: String): String = {
    val i = u.indexOf('#')
    if (i >= 0) u.substring(0, i) else u
  }

  /** Rule 2: everything after the FIRST `//`, fragment stripped. */
  private def rest(u: String): String = {
    val b = stripFragment(u)
    val i = b.indexOf("//")
    if (i >= 0) b.substring(i + 2) else b
  }

  /** Authority ends at the first of `/` or `?` — a URL with a query
    * but no path (`https://example.com?a=1`) must not fold the query
    * into the host (r7 advice: utm-stripping and param sorting never
    * ran on such URLs, and `host?q` vs `host/?q` got different keys). */
  private def hostport(r: String): String = {
    var e = r.length
    val slash = r.indexOf('/')
    if (slash >= 0) e = slash
    val q = r.indexOf('?')
    if (q >= 0 && q < e) e = q
    r.substring(0, e)
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  private def isUnreserved(code: Int): Boolean =
    (code >= '0' && code <= '9') || (code >= 'A' && code <= 'Z') ||
      (code >= 'a' && code <= 'z') ||
      code == '-' || code == '.' || code == '_' || code == '~'

  /** Rule 4 — public so BOTH eval paths and the spec share one body. */
  def pctNormalize(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val code = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(code)) sb.append(code.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Rules 1–3: canonical hostname. Lowercase (ROOT locale — matching
    * the oracle's `lower()`; the hash-gated synthetic domain is ASCII
    * by construction), then default-port and `www.` strip, then an
    * internationalized host punycodes to its ASCII-compatible form
    * (`java.net.IDN.toASCII` — the DNS wire form, so `münchen.example`
    * and its `xn--mnchen-3ya.example` spelling collapse to one origin
    * key). IDN is exercised by the handcrafted spec, not the oracle
    * (DuckDB has no punycode builtin; the graded corpus stays ASCII,
    * where the rule is a no-op). Malformed IDN input keeps its
    * lowercased form rather than failing the whole canonicalization. */
  def host(url: String): String = {
    val hp0 = hostport(rest(url))
    // strip userinfo (user:pass@host — RFC 3986 authority): identity
    // must never split the origin key, and crawl URLs carry it
    val at = hp0.lastIndexOf('@')
    val hp = (if (at >= 0) hp0.substring(at + 1) else hp0)
      .toLowerCase(java.util.Locale.ROOT)
    val h1 =
      if (hp.endsWith(":443")) hp.substring(0, hp.length - 4)
      else if (hp.endsWith(":80")) hp.substring(0, hp.length - 3)
      else hp
    // strip 'www.' in a LOOP: www.www.example.com must reach the same
    // key in one pass as in two (the canon∘canon == canon law — r7
    // advice found the single strip violated it on stacked prefixes)
    var h2 = h1
    while (h2.startsWith("www.")) h2 = h2.substring(4)
    var ascii = true
    var i = 0
    while (ascii && i < h2.length) { ascii = h2.charAt(i) < 128; i += 1 }
    if (ascii) h2
    else try java.net.IDN.toASCII(h2)
      .toLowerCase(java.util.Locale.ROOT)
    catch { case _: IllegalArgumentException => h2 }
  }

  /** The full canonical key (rules 1–7). */
  def canonical(url: String): String = {
    val r = rest(url)
    val pathq = pctNormalize(r.substring(hostport(r).length))
    val qi = pathq.indexOf('?')
    val p0 = if (qi >= 0) pathq.substring(0, qi) else pathq
    val qs = if (qi >= 0) pathq.substring(qi + 1) else ""
    var e = p0.length
    while (e > 0 && p0.charAt(e - 1) == '/') e -= 1
    val cpath = if (e == 0) "/" else p0.substring(0, e)
    val params = qs.split("&", -1)
      .filter(x => x.nonEmpty && !x.startsWith("utm_")).sorted
    val sb = new java.lang.StringBuilder("https://")
    sb.append(host(url)).append(cpath)
    if (params.nonEmpty) sb.append('?').append(params.mkString("&"))
    sb.toString
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonicalize_url", exprs => CanonicalizeUrl(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_host", exprs => UrlHostExpr(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pct_normalize", exprs => PctNormalizeExpr(exprs(0)), "built-in")
  }
}

/** [[UrlCanon.pctNormalize]] (rule 4 alone) as a codegen'd unary
  * expression — the standalone RFC 3986 §6.2.2 primitive for callers
  * normalizing percent-encoding outside full URL canonicalization. */
case class PctNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pct_normalize expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(UrlCanon.pctNormalize(
      s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.UrlCanon.pctNormalize($c.toString()));"""
        .stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): PctNormalizeExpr = copy(child = newChild)
}

/** [[UrlCanon.canonical]] as a codegen'd unary expression. */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canonicalize_url expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(UrlCanon.canonical(
      s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.UrlCanon.canonical($c.toString()));"""
        .stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): CanonicalizeUrl = copy(child = newChild)
}

/** [[UrlCanon.host]] as a codegen'd unary expression. */
case class UrlHostExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_host expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(UrlCanon.host(
      s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.UrlCanon.host($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): UrlHostExpr = copy(child = newChild)
}
