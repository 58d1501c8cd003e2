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

/** MOJIBAKE REPAIR (the ftfy core loop as a codegen'd kernel): text
  * that was UTF-8 but got decoded as Windows-1252/Latin-1 somewhere in
  * the crawl chain reads as `cafÃ©` / `donâ€™t` — the single most
  * common encoding damage in web corpora. The repair is the exact
  * inverse: re-encode the string through "sloppy cp1252" (chars
  * < U+0100 as their Latin-1 byte, the 27 cp1252 C1-range printables
  * as their 0x80-0x9F bytes, anything else → NOT mojibake, bail) and
  * strictly re-decode as UTF-8. The strict decode IS the safety
  * guard: genuine Latin-1 text (`café` — byte E9 followed by ASCII)
  * or real non-Latin text (chars outside cp1252's image) fails one of
  * the two steps and passes through UNCHANGED — the repair only fires
  * on byte streams that round-trip as valid multi-byte UTF-8, which
  * is precisely the mojibake signature. Runs to a fixpoint (≤ 3
  * passes) so double-encoded text (`cafÃƒÂ©`) also heals. Fast path:
  * all-ASCII input returns the buffer untouched, zero alloc.
  * Map-only, null-safe; compose BEFORE [[UnicodeNormalize]] in a
  * curation pass (repair bytes, then canonicalize). */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fix_mojibake expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "fix_mojibake"

  /** One repair pass; null = not mojibake (leave the input alone). */
  private def repairOnce(s: String): String = {
    val n = s.length
    var hasHigh = false
    var i = 0
    while (i < n && !hasHigh) { if (s.charAt(i) >= 0x80) hasHigh = true
      i += 1 }
    if (!hasHigh) return null
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x100) bytes(i) = c.toByte
      else {
        val b = FixMojibake.Cp1252Reverse.getOrElse(c, -1)
        if (b < 0) return null // outside cp1252's image: real text
        bytes(i) = b.toByte
      }
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val out =
      try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      catch {
        case _: java.nio.charset.CharacterCodingException => return null
      }
    // a strict multi-byte decode always shrinks; equality means the
    // bytes were pure ASCII (unreachable past the hasHigh gate) — keep
    // the guard so the fixpoint loop can never cycle
    if (out.length >= s.length) null else out
  }

  /** Row kernel — public so generated code can call it. */
  def kernel(input: UTF8String): UTF8String = {
    var s = input.toString
    var changed = false
    var pass = 0
    var done = false
    while (pass < 3 && !done) {
      val r = repairOnce(s)
      if (r == null) done = true
      else { s = r; changed = true; pass += 1 }
    }
    if (!changed) input else UTF8String.fromString(s)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fixMojibake", this,
      classOf[FixMojibake].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object FixMojibake {
  /** Column form: `fixMojibake(text)`. */
  def apply(text: Column): Column =
    Bridge.column(new FixMojibake(Bridge.expression(text)))

  /** The 27 printable cp1252 code points in the C1 byte range — the
    * published Windows-1252 table (0x81/0x8D/0x8F/0x90/0x9D are
    * undefined; their C1 controls take the Latin-1 branch). */
  private[functions] val Cp1252Reverse: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83,
    '„' -> 0x84, '…' -> 0x85, '†' -> 0x86,
    '‡' -> 0x87, 'ˆ' -> 0x88, '‰' -> 0x89,
    'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92,
    '“' -> 0x93, '”' -> 0x94, '•' -> 0x95,
    '–' -> 0x96, '—' -> 0x97, '˜' -> 0x98,
    '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)
}
