package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** UNIGRAM-LM VITERBI SEGMENTATION as a per-word row kernel — the
  * closed form of [[graft.text.TextOps.unigramSegmentPlan]]'s unrolled
  * relational DP (`maxLen` sequential join+argmax rounds, each a
  * localCheckpoint barrier) collapsed into ONE codegen'd projection
  * over the distinct-word domain: a word of length ≤ maxLen needs only
  * O(len · maxPiece) hash probes into the broadcast (piece → lnp)
  * table, so scheduling 12 shuffle rounds to compute it was pure
  * latency ([[BpeEncodeWord]] made the identical trade for the BPE
  * merge fold). Bit-equality with the relational DP is spec-pinned
  * (differential over tie-heavy, metaspace-alphabet, and unreachable
  * corpora): both walk best(i) = max_j best(j) + lnp(word[j..i]) with
  * the SAME argmax order — (score, −j, piece, segs), doubles compared
  * the SQL way (`==` first, so −0.0 ties 0.0), strings in UTF-8 binary
  * order (= code-point order; Java's UTF-16 `compareTo` diverges on
  * supplementary chars and must not be used) — and the same
  * left-to-right IEEE addition along the chosen path, so equal-score
  * ties break identically down to the bit.
  *
  * Input: one WORD (positions are CODE POINTS, the SQL `substr`/
  * `length` unit the relational DP indexed by). Output: a struct
  * (n_pieces LONG, score DOUBLE — the RAW summed lnp; callers apply
  * the 6dp edge rounding so Spark's own `round` semantics stay the
  * single source of truth — segs STRING, '|'-joined), or NULL when no
  * segmentation reaches the end (vocab missing one of the word's
  * characters) — the relational DP's silent word drop, surfaced as a
  * filterable null. Null input → null output. */
case class UnigramSegmentWord(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[String, java.lang.Double]],
    maxPiece: Int)
    extends UnaryExpression {

  require(maxPiece >= 1, s"maxPiece must be >= 1, got $maxPiece")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_segment_word expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("segs", StringType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "unigram_segment_word"

  /** UTF-8 binary order = code-point order — the comparison Spark's
    * struct ordering applies to StringType (UTF8String.compareTo). */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Spark's SQL double ordering (SQLOrderingUtil): `==` short-circuit
    * first so −0.0 ties 0.0; lnp sums are finite so the NaN branch of
    * Double.compare is unreachable but kept for exactness. */
  private def cmpD(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Row kernel — public so generated code can call it. Returns null
    * when the final position is unreachable under the vocab. */
  def kernel(wU: UTF8String): InternalRow = {
    val word = wU.toString
    val vocab = bc.value
    // code-point position → Java char index (the SQL substr unit map)
    val len = word.codePointCount(0, word.length)
    if (len == 0) return null
    val idx = new Array[Int](len + 1)
    var ci = 0
    var p = 0
    while (p < len) {
      idx(p) = ci
      ci += Character.charCount(word.codePointAt(ci))
      p += 1
    }
    idx(len) = word.length
    val reach = new Array[Boolean](len + 1)
    val score = new Array[Double](len + 1)
    val np = new Array[Long](len + 1)
    val segs = new Array[String](len + 1)
    reach(0) = true
    segs(0) = ""
    var i = 1
    while (i <= len) {
      var bestScore = 0.0
      var bestJ = 0
      var bestPiece: String = null
      var bestSegs: String = null
      var plen = 1
      val pmax = math.min(maxPiece, i)
      while (plen <= pmax) {
        val j = i - plen
        if (reach(j)) {
          val piece = word.substring(idx(j), idx(i))
          val lnp = vocab.get(piece)
          if (lnp != null) {
            val s = score(j) + lnp.doubleValue()
            val sg = if (segs(j).isEmpty) piece
                     else segs(j) + "|" + piece
            // argmax by (score, −j, piece, segs): the relational DP's
            // max_by struct order. −j favors the SMALLER j on ties —
            // since plen ascends, a later candidate has smaller j and
            // wins score ties unless an earlier (larger-j) one beat it
            // on the string legs; compare the full chain each time.
            val better =
              if (bestPiece == null) true
              else {
                val c1 = cmpD(s, bestScore)
                if (c1 != 0) c1 > 0
                else if (j != bestJ) -j > -bestJ
                else {
                  val c3 = cpCompare(piece, bestPiece)
                  if (c3 != 0) c3 > 0
                  else cpCompare(sg, bestSegs) > 0
                }
              }
            if (better) {
              bestScore = s
              bestJ = j
              bestPiece = piece
              bestSegs = sg
            }
          }
        }
        plen += 1
      }
      if (bestPiece != null) {
        reach(i) = true
        score(i) = bestScore
        np(i) = np(bestJ) + 1L
        segs(i) = bestSegs
      }
      i += 1
    }
    if (!reach(len)) null
    else new GenericInternalRow(Array[Any](np(len), score(len),
      UTF8String.fromString(segs(len))))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegmentWord", this,
      classOf[UnigramSegmentWord].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.kernel($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnigramSegmentWord {
  /** Column form over a broadcast (piece → lnp) table — pieces must be
    * DISTINCT (every vocab producer group-bys by piece; a duplicate
    * would make the relational DP's join fan out where the map cannot,
    * so [[graft.text.TextOps.unigramVocabBroadcast]] rejects them). */
  def apply(word: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, java.lang.Double]],
      maxPiece: Int): Column =
    Bridge.column(new UnigramSegmentWord(Bridge.expression(word), bc,
      maxPiece))
}
