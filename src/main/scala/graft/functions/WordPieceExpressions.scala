package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece subword encoding — the BERT tokenizer family's greedy
  * longest-match-first algorithm (Wu et al. 2016; the public
  * BERT/HuggingFace `WordpieceTokenizer` semantics), completing the
  * engine's tokenizer trio next to byte-level BPE
  * ([[BpeEncodeWord]]+[[Gpt2Bytes]]) and the unigram-LM segmenter:
  *
  *  - a word longer than `maxChars` characters encodes as the single
  *    `unk` token (the reference's `max_input_chars_per_word` guard);
  *  - otherwise, from each position take the LONGEST vocabulary entry
  *    matching there — position 0 matches entries verbatim, later
  *    positions match `##`-prefixed continuation entries;
  *  - if NO entry matches at some position, the WHOLE word collapses
  *    to `unk` (greedy, no backtracking — pieces already taken are
  *    discarded, exactly the reference behavior).
  *
  * The vocabulary rides a Spark BROADCAST ([[WordPiece.Vocab]] — a
  * 30k-entry BERT vocab as plan literals would hit the same plan-size
  * ceiling the BPE merge table did), so the plan is O(1) in vocab size
  * and the per-word cost is O(len · maxPieceLen) hash probes — bounded
  * by the longest vocabulary entry, not the vocab count. Map-only;
  * the corpus never shuffles.
  *
  * Character positions are UTF-16-BMP (`substring` semantics — the
  * [[BpeEncodeWord]]/`bpePairCounts` convention; the reference
  * implementation walks code points, identical on BMP text).
  */
object WordPiece {

  /** Broadcast payload: membership/id map plus the derived matching
    * bounds. Build ONCE via [[WordPiece.build]] and broadcast; the
    * same map serves encode (membership) and id lookup. */
  final class Vocab(
      val ids: java.util.HashMap[String, Integer],
      val maxRawLen: Int,
      val unk: String,
      val maxChars: Int) extends Serializable

  /** Build the broadcastable vocab table from (token, id) pairs.
    * `##`-prefixed entries are continuation pieces (matched at
    * positions > 0 with the prefix stripped); everything else is a
    * start piece. `unk` must itself be a vocab entry — an encoder
    * whose failure token has no id cannot feed the id path. */
  def build(vocab: Seq[(String, Int)], unk: String = "[UNK]",
            maxChars: Int = 100): Vocab = {
    require(vocab.nonEmpty, "vocab must not be empty")
    require(maxChars > 0, s"maxChars must be positive, got $maxChars")
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    var maxRaw = 1
    vocab.foreach { case (tok, id) =>
      require(tok.nonEmpty, "vocab entries must be non-empty")
      require(!tok.contains(" "),
        s"vocab entry '$tok' contains a space — not encodable into " +
          "the space-separated piece string")
      val raw = if (tok.startsWith("##")) tok.length - 2 else tok.length
      if (raw > maxRaw) maxRaw = raw
      m.put(tok, Integer.valueOf(id))
    }
    require(m.containsKey(unk),
      s"unk token '$unk' must be a vocab entry")
    new Vocab(m, maxRaw, unk, maxChars)
  }

  /** Column-level WordPiece word encode against a broadcast vocab
    * (see [[WordPieceEncodeWord]]). */
  def encodeWord(word: Column,
      bc: org.apache.spark.broadcast.Broadcast[Vocab]): Column =
    Bridge.column(WordPieceEncodeWord(Bridge.expression(word), bc))

  /** Column-level piece-string → ids against the SAME broadcast the
    * encoder used (see [[WordPieceIds]]). */
  def idsOf(pieces: Column,
      bc: org.apache.spark.broadcast.Broadcast[Vocab]): Column =
    Bridge.column(WordPieceIds(Bridge.expression(pieces), bc))
}

/** Space-separated WordPiece pieces → token IDS against the SAME
  * broadcast vocab [[WordPieceEncodeWord]] consumed — WordPiece's
  * encode vocab IS its id vocab, so ONE broadcast serves both sides
  * and ids are -1-free by construction (every emitted piece, unk
  * included, is a vocab entry; -1 can only mean the pieces came from
  * a DIFFERENT vocab, which is exactly what it flags). Empty input
  * returns an empty array (the [[VocabIds]] contract). */
case class WordPieceIds(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[WordPiece.Vocab])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"wordpiece_ids expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types
    .ArrayType(org.apache.spark.sql.types.IntegerType, false)

  override def prettyName: String = "wordpiece_ids"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = input.toString
    if (s.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyIntArray)
    val ids = bc.value.ids
    val syms = s.split(" ", -1)
    val out = new Array[Int](syms.length)
    var i = 0
    while (i < syms.length) {
      val id = ids.get(syms(i))
      out(i) = if (id == null) -1 else id.intValue()
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceIds", this,
      classOf[WordPieceIds].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One word → its space-separated WordPiece pieces (see [[WordPiece]]
  * for the semantics). Empty input ("" — the null-word contract
  * upstream) returns "", not unk: no characters, no pieces. */
case class WordPieceEncodeWord(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[WordPiece.Vocab])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode_word expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "wordpiece_encode_word"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: UTF8String): UTF8String = {
    val word = input.toString
    if (word.isEmpty) return UTF8String.EMPTY_UTF8
    val v = bc.value
    if (word.length > v.maxChars) return UTF8String.fromString(v.unk)
    val vocab = v.ids
    val sb = new java.lang.StringBuilder(word.length * 2)
    var pos = 0
    while (pos < word.length) {
      // longest vocabulary entry matching at pos, continuation form
      // for pos > 0; no match anywhere → the whole word is unk
      var end = math.min(word.length, pos + v.maxRawLen)
      var piece: String = null
      while (piece == null && end > pos) {
        val cand =
          if (pos == 0) word.substring(pos, end)
          else "##" + word.substring(pos, end)
        if (vocab.containsKey(cand)) piece = cand else end -= 1
      }
      if (piece == null) return UTF8String.fromString(v.unk)
      if (pos > 0) sb.append(' ')
      sb.append(piece)
      pos = end
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceEncode", this,
      classOf[WordPieceEncodeWord].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
