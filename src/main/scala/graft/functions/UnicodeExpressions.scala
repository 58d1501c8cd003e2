package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a codegen'd kernel — the step the
  * engine's targeted fold set (graft.text.TextOps normalization ops)
  * deliberately stopped short of: canonical composition BEFORE digest
  * dedup ("café" composed and "cafe" + U+0301 are byte-different,
  * hash-different, and the SAME text — NFC collapses them), and
  * compatibility folding (NFKC: ligatures, full-width forms, circled
  * digits) for tokenizer-facing canonicalization.
  *
  * Backed by `java.text.Normalizer` (the JDK's ICU-derived tables —
  * stable across Unicode versions for the canonical forms; DuckDB's
  * `nfc_normalize` replays NFC bit-identically, which is what makes the
  * NFC query strictly oracle-able). A quick-check fast path
  * (`Normalizer.isNormalized`) makes already-normal text — all ASCII
  * included — one scan with zero allocation, so the kernel is safe to
  * leave ON in stage-1 scans. Map-only, null-safe, no shuffle.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form '$form'")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_normalize"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: UTF8String): UTF8String = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormalize", this,
      classOf[UnicodeNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnicodeNormalize {
  /** Column form: `unicodeNormalize(text, "NFC")`. */
  def apply(text: Column, form: String): Column =
    Bridge.column(new UnicodeNormalize(Bridge.expression(text), form))
}
