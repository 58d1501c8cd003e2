package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern SUBSTRING matching as one Aho-Corasick pass — the
  * keyword-list gate URL curation actually needs (C4/CCNet-style
  * "blocked token anywhere in the URL" lists run to thousands of
  * entries): per-row cost is O(chars + matches), INDEPENDENT of the
  * pattern count, where the naive form is K chained `contains` calls —
  * O(chars·K) and a K-node plan. The automaton is built once
  * driver-side and rides ONE broadcast; the plan carries only the
  * handle. Matching is case-sensitive over UTF-16 units — lowercase
  * both sides upstream for the usual case-folded lists.
  */
object AhoCorasick {

  /** The classic goto/fail/output automaton. Nodes are dense ints;
    * transitions live in per-node hash maps (pattern alphabets are
    * tiny relative to UTF-16, so dense tables would waste memory). */
  final class Automaton(
      val patterns: Array[String],
      val next: Array[java.util.HashMap[Character, Integer]],
      val fail: Array[Int],
      val out: Array[Array[Int]]) extends Serializable

  /** Build the automaton. Patterns must be non-empty; duplicates are
    * rejected (the match list would double-report). Pattern order is
    * the REPORTING order — [[MultiMatches]] returns matched patterns
    * sorted by their position in this list, which keeps results
    * deterministic and engine-replayable. */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "pattern list must not be empty")
    require(patterns.forall(_.nonEmpty), "patterns must be non-empty")
    require(patterns.distinct.size == patterns.size,
      "duplicate patterns would double-report")
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outSets = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Set.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        val to = next(node).get(c)
        if (to == null) {
          next += new java.util.HashMap[Character, Integer]()
          outSets += scala.collection.mutable.Set.empty[Int]
          next(node).put(c, Integer.valueOf(next.size - 1))
          node = next.size - 1
        } else node = to.intValue()
        i += 1
      }
      outSets(node) += pi
    }
    // BFS failure links; output sets inherit through them
    val fail = new Array[Int](next.size)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).forEach { (_, to) => fail(to) = 0; queue += to.intValue() }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).forEach { (c, to) =>
        var f = fail(u)
        while (f != 0 && next(f).get(c) == null) f = fail(f)
        val g = next(f).get(c)
        fail(to.intValue()) =
          if (g != null && g.intValue() != to.intValue()) g.intValue()
          else 0
        outSets(to.intValue()) ++= outSets(fail(to.intValue()))
        queue += to.intValue()
      }
    }
    new Automaton(patterns.toArray, next.toArray, fail,
      outSets.map(_.toArray.sorted).toArray)
  }

  /** Column form: distinct matched patterns, pattern-list order (see
    * [[MultiMatches]]). */
  def matches(text: Column,
      bc: org.apache.spark.broadcast.Broadcast[Automaton]): Column =
    Bridge.column(MultiMatches(Bridge.expression(text), bc))
}

/** Distinct patterns of a broadcast [[AhoCorasick.Automaton]] found
  * anywhere in the input, as an ARRAY<STRING> in pattern-list order
  * (deterministic — an engine replays it as an ordered
  * contains-filter over the same constant list). Empty input → empty
  * array. */
case class MultiMatches(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[AhoCorasick.Automaton])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"multi_matches expects STRING, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "multi_matches"

  /** Row kernel — public so generated code can call it. */
  def kernel(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val a = bc.value
    val hit = new java.util.BitSet(a.patterns.length)
    var node = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      var g = a.next(node).get(c)
      while (g == null && node != 0) {
        node = a.fail(node)
        g = a.next(node).get(c)
      }
      node = if (g == null) 0 else g.intValue()
      val outs = a.out(node)
      var j = 0
      while (j < outs.length) { hit.set(outs(j)); j += 1 }
      i += 1
    }
    val n = hit.cardinality()
    val res = new Array[Any](n)
    var k = 0
    var pi = hit.nextSetBit(0)
    while (pi >= 0) {
      res(k) = UTF8String.fromString(a.patterns(pi))
      k += 1
      pi = hit.nextSetBit(pi + 1)
    }
    new GenericArrayData(res)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiMatches", this,
      classOf[MultiMatches].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
