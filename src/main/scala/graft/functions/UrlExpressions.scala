package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable domain of a host under an EXPLICIT public-suffix rule set,
  * with full publicsuffix.org semantics — the production-exact companion
  * to [[graft.text.UrlOps.registeredDomain]]'s 7-suffix heuristic.
  *
  * Rule forms (the PSL file grammar):
  *  - `co.uk`   — plain: `co.uk` is a public suffix
  *  - `*.ck`    — wildcard: every `<label>.ck` is a public suffix
  *  - `!www.ck` — exception: `www.ck` is NOT a public suffix (beats any
  *                matching wildcard; its suffix is the rule minus its
  *                leftmost label)
  *
  * Prevailing rule = any matching exception, else the LONGEST matching
  * rule, else the implicit `*` (last label). The registrable domain is
  * the public suffix plus one more label; a host that IS a public suffix
  * (or a single label) comes back unchanged, lowercased — same
  * conventions as the heuristic, so the two are drop-in interchangeable
  * as grouping keys.
  *
  * The rule set is bound into the expression (driver-side parse into
  * three hash sets, shipped once per task via the serialized expression —
  * the full PSL is ~10⁴ entries, list-sized). Per row: one lowercase, one
  * split, ≤ 2·labels set probes — map-only, codegen'd, no shuffle and no
  * UDF. Used by the per-domain cap and blocklist composition wherever the
  * heuristic's coverage is not enough.
  */
case class RegisteredDomainPsl(child: Expression, rules: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"registered_domain_psl expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "registered_domain_psl"

  // driver-parsed once; @transient + lazy so executors rebuild from the
  // (small) `rules` Seq after deserialization
  @transient private lazy val exactSet: Set[String] =
    rules.filter(r => !r.startsWith("*.") && !r.startsWith("!")).toSet
  @transient private lazy val wildcardSet: Set[String] =
    rules.collect { case r if r.startsWith("*.") => r.substring(2) }.toSet
  @transient private lazy val exceptionSet: Set[String] =
    rules.collect { case r if r.startsWith("!") => r.substring(1) }.toSet

  /** Row kernel — public so generated code can call it. */
  def kernel(host: UTF8String): UTF8String = {
    val h = host.toString.toLowerCase(Locale.ROOT)
    val labels = h.split('.')
    val n = labels.length
    if (n <= 1) return UTF8String.fromString(h)
    // exception rules beat everything, regardless of length
    var psLen = -1
    if (exceptionSet.nonEmpty) {
      var k = n
      while (k >= 1 && psLen < 0) {
        if (exceptionSet.contains(suffixOf(labels, k))) psLen = k - 1
        k -= 1
      }
    }
    // else the longest matching plain/wildcard rule (longest-first scan)
    if (psLen < 0) {
      var k = n
      while (k >= 1 && psLen < 0) {
        val cand = suffixOf(labels, k)
        if (exactSet.contains(cand)) psLen = k
        else if (k >= 2 && wildcardSet.contains(suffixOf(labels, k - 1)))
          psLen = k
        k -= 1
      }
    }
    if (psLen < 0) psLen = 1 // implicit `*` rule
    val regLen = math.min(n, psLen + 1)
    UTF8String.fromString(suffixOf(labels, regLen))
  }

  private def suffixOf(labels: Array[String], k: Int): String = {
    if (k <= 0) return ""
    val sb = new java.lang.StringBuilder()
    var i = labels.length - k
    while (i < labels.length) {
      if (i > labels.length - k) sb.append('.')
      sb.append(labels(i))
      i += 1
    }
    sb.toString
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("registeredDomainPsl", this,
      classOf[RegisteredDomainPsl].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** XML character-reference decode (the sitemap `<loc>` repair): one
  * left-to-right pass resolving the five predefined entities
  * (`&amp; &lt; &gt; &quot; &apos;`) and numeric references
  * (`&#NNN;` decimal, `&#xHH;` hex, any Unicode code point) — the
  * single-pass rule, so `&amp;lt;` correctly yields the literal text
  * `&lt;`, never `<`. A regex-structural sitemap parse hands URLs
  * over STILL ESCAPED (sitemaps.org requires entity-escaping inside
  * `<loc>`), and an `&amp;`-bearing URL matches neither its robots
  * rule, its captured-set twin, nor the real fetch until decoded.
  *
  * LENIENT on malformed input (bare `&`, unknown or unterminated
  * entities, out-of-range code points pass through verbatim) — crawl
  * XML is machine-generated but not always valid, and a decode gate
  * must never throw mid-scan. Fast path: no `&` at all (the common
  * case — most URLs carry no query string) returns the input buffer
  * untouched, zero allocation. Map-only, null-safe, codegen'd. */
case class XmlUnescape(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"xml_unescape expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "xml_unescape"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: UTF8String): UTF8String = {
    val s = input.toString
    if (s.indexOf('&') < 0) return input
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        // the longest predefined entity is 6 chars incl. & and ; —
        // numeric forms get a few more digits; anything further out
        // is not an entity this decoder recognizes
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val decoded: Int = body match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case _ if body.length >= 2 && body.charAt(0) == '#' =>
              try {
                val cp =
                  if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
                    Integer.parseInt(body.substring(2), 16)
                  else Integer.parseInt(body.substring(1), 10)
                if (Character.isValidCodePoint(cp) && cp > 0) cp else -1
              } catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (decoded < 0) { sb.append(c); i += 1 }
          else { sb.appendCodePoint(decoded); i = semi + 1 }
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("xmlUnescape", this,
      classOf[XmlUnescape].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UrlExpressions {
  /** Column-level PSL registrable domain (see [[RegisteredDomainPsl]]). */
  def registeredDomainPsl(host: Column, rules: Seq[String]): Column =
    Bridge.column(RegisteredDomainPsl(Bridge.expression(host), rules))

  /** Column-level XML character-reference decode (see [[XmlUnescape]]). */
  def xmlUnescape(text: Column): Column =
    Bridge.column(XmlUnescape(Bridge.expression(text)))
}
