package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline layer (SURVEY §2.5
  * #63–66). Everything here is pure `Column` expressions — whole-stage
  * codegen'd, no UDFs — so they run at scan speed and survive a 1000×
  * scale-up untouched: per-row work, no shuffle.
  */
object TextFunctions {

  /** Explicit whitespace class body, shared VERBATIM with the DuckDB
    * oracle SQL. Java's `\s` is exactly `[ \t\n\x0B\f\r]`, but RE2's
    * `\s` omits `\x0B` (vertical tab) — a raw `\s` in patterns applied
    * by both engines diverges on any document containing `\x0B`. The
    * explicit class is identical to Java's `\s` (Spark-side behavior
    * unchanged) and makes RE2 agree on every input. */
  val wsBody = " \\t\\n\\x0B\\f\\r"
  /** `[ \t\n\x0B\f\r]` — the whitespace class itself. */
  val wsClass = s"[$wsBody]"
  /** [[wsClass]] with backslashes doubled for embedding in a Spark SQL
    * string literal (the SQL parser consumes one level of escapes; DuckDB
    * literals do NOT, so the oracle side interpolates [[wsClass]] raw). */
  val wsClassSql = wsClass.replace("\\", "\\\\")
  /** `[^a-z0-9 \t\n\x0B\f\r]` — punctuation (non-alnum, non-ws). */
  val punctClass = s"[^a-z0-9$wsBody]"
  /** BPE-ish subword pattern: alpha runs, single digits, single
    * punctuation marks. */
  val bpeRe = s"[a-z]+|[0-9]|$punctClass"

  /** Canonical form for dedup/fingerprinting: lowercase, collapse runs of
    * whitespace, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), s"$wsClass+", " "))

  /** Content fingerprint (md5 of normalized text) — portable across
    * engines, used as the exact-dedup key. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Non-empty whitespace tokens of the lowercased text. */
  def wsTokens(c: Column): Column =
    filter(split(lower(c), s"$wsClass+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish subword count: alpha runs, single digits, single
    * punctuation marks — a deterministic stand-in for a real tokenizer
    * with the right asymptotics (supra-linear in punctuation/digits,
    * like BPE vocabularies behave). */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(bpeRe), lit(0)))

  /** Multiplicity-preserving count of `arr` elements that appear in the
    * fixed `words` list — the native codegen'd
    * [[graft.functions.ArrayCountIn]] (hash-set probe, zero per-row
    * allocation) rather than the interpreted `size(filter(arr, isin))`
    * lambda, which boxes every token through the higher-order-function
    * interpreter. Requires `array_count_in` on the session's function
    * registry ([[graft.functions.ArrayCountIn.register]] — idempotent —
    * or the [[graft.functions.GraftExtensions]] plugin); query call
    * sites register before use. Returns bigint; null array → null, null
    * elements never count (same semantics as the lambda form, asserted
    * in ArrayCountInSpec). */
  def arrayHits(arr: Column, words: Seq[String]): Column =
    call_function("array_count_in", arr, array(words.map(lit): _*))

  /** Count of tokens of `c` that appear in `words` (see [[arrayHits]]). */
  def tokenHits(c: Column, words: Seq[String]): Column =
    arrayHits(wsTokens(c), words)

  val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "for")
  val deStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val frStop = Seq("le", "la", "les", "et", "est", "une", "des")
  val esStop = Seq("el", "los", "las", "y", "es", "una", "por")

  /** Training-data scrub patterns — RE2-safe (no lookaround, explicit
    * whitespace class), so the DuckDB oracle applies the IDENTICAL
    * regexes with identical semantics. */
  val urlRe = s"https?://[^$wsBody]+"
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Scrub (§2.5 #66c): mask URLs then e-mails (URLs first — they can
    * contain `@`), collapse the whitespace runs the masking leaves,
    * trim. Pure per-row column math: scan-speed at any scale. */
  def scrubText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(regexp_replace(c, urlRe, "<URL>"), emailRe, "<EMAIL>"),
      s"$wsClass+", " "))

  /** CJK character count (the zh signal). */
  def cjkCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[\\u4e00-\\u9fff]"), lit(0)))

  /** n-gram language-ID heuristic (§2.5 #63): stopword-hit scores per
    * candidate language with a fixed priority tie-break. Returns the
    * predicted language code. */
  def langId(c: Column): Column = {
    val en = tokenHits(c, enStop); val de = tokenHits(c, deStop)
    val fr = tokenHits(c, frStop); val es = tokenHits(c, esStop)
    when(cjkCount(c) > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Punctuation-character ratio of the lowercased text. */
  def punctRatio(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(punctClass), lit(0)))
      .cast("double") / length(c).cast("double")

  /** English-stopword ratio over whitespace tokens. */
  def stopRatio(c: Column): Column =
    tokenHits(c, enStop).cast("double") / tokenCount(c).cast("double")

  /** Mean token length (non-whitespace chars / tokens). */
  def meanTokenLen(c: Column): Column =
    length(regexp_replace(c, wsClass, "")).cast("double") /
      tokenCount(c).cast("double")

  /** Composite quality score (§2.5 #64): linear blend of
    * length/punctuation/stopword features — every term a deterministic
    * double, identical across engines. */
  def qualityScore(c: Column): Column =
    least(length(c).cast("double") / lit(500.0), lit(1.0)) * lit(0.3) +
      stopRatio(c) * lit(0.4) +
      (lit(1.0) - punctRatio(c)) * lit(0.2) +
      least(meanTokenLen(c) / lit(8.0), lit(1.0)) * lit(0.1)

  /** Hostname of a URL after canonicalization (§2.5 #66d): lowercased,
    * default ports (:443 for the https canonical scheme, :80 for the
    * http origin it upgrades) stripped, leading `www.` stripped. The
    * full rule-set and the design rationale for the native-expression
    * form live on [[graft.functions.UrlCanon]]. Resolves by name at
    * analysis time — call `UrlCanon.register(spark)` first (the repo's
    * native-expression idiom, same as nfc_normalize). */
  def urlHost(url: Column): Column = call_function("url_host", url)

  /** URL canonicalization (§2.5 #66d) — the crawl-dedup key: fragment
    * stripped, bounded `//` parse, host per [[urlHost]], scheme
    * normalized to https, RFC 3986 §6.2.2 percent-encoding
    * normalization (unreserved triplets decoded, others uppercased),
    * trailing path slashes removed (bare host → "/"), utm_* tracking
    * params dropped, remaining query params SORTED. One codegen'd
    * Catalyst expression ([[graft.functions.UrlCanon]] has the rule
    * list and why a composed-Column form is unusable here);
    * idempotent (canon(canon(u)) = canon(u), asserted in
    * QueriesSpec). */
  def canonicalizeUrl(url: Column): Column =
    call_function("canonicalize_url", url)
}
