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

object UrlExpressions {
  /** Column-level PSL registrable domain (see [[RegisteredDomainPsl]]). */
  def registeredDomainPsl(host: Column, rules: Seq[String]): Column =
    Bridge.column(RegisteredDomainPsl(Bridge.expression(host), rules))
}
