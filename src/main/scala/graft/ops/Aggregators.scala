package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` surface (SURVEY.md §2.9): the one aggregation the
  * relational operators don't express in a single pass — interval-set
  * union ("total covered time") — as a UDAF. The relational route
  * ([[Windows.mergeIntervals]] → sum of lengths) needs a window over the
  * full interval list per key; this aggregator computes the same result
  * with map-side partial merges (each task pre-unions its slice, only
  * disjoint interval lists shuffle), which is the shape that scales when
  * one key has millions of intervals spread over many partitions.
  */
object Aggregators {

  /** One interval, microseconds, half-open-ish ([s,e]; touching intervals
    * merge — same convention as [[Windows.mergeIntervals]]). */
  case class Iv(s: Long, e: Long)

  /** Buffer invariant: sorted by start, pairwise disjoint and
    * non-touching. */
  private def insert(buf: List[Iv], iv: Iv): List[Iv] = {
    // split around the insertion point, merge everything that overlaps or
    // touches [iv.s, iv.e], stitch back — O(n) with n = disjoint regions
    val (before, rest) = buf.span(_.e < iv.s)
    val (overlap, after) = rest.span(_.s <= iv.e)
    val merged =
      if (overlap.isEmpty) iv
      else Iv(math.min(iv.s, overlap.head.s),
        math.max(iv.e, overlap.map(_.e).max))
    before ::: merged :: after
  }

  /** Interval-union aggregator: total covered microseconds of the union of
    * (possibly overlapping) [s,e] micro-timestamp intervals. */
  class IntervalUnion extends Aggregator[Iv, List[Iv], Long] {
    override def zero: List[Iv] = Nil
    override def reduce(buf: List[Iv], iv: Iv): List[Iv] = insert(buf, iv)
    override def merge(a: List[Iv], b: List[Iv]): List[Iv] =
      b.foldLeft(a)(insert)
    override def finish(buf: List[Iv]): Long =
      buf.iterator.map(iv => iv.e - iv.s).sum
    override def bufferEncoder: Encoder[List[Iv]] =
      ExpressionEncoder[List[Iv]]()
    override def outputEncoder: Encoder[Long] =
      ExpressionEncoder[Long]()
  }

  /** Column form: `intervalCoverageUs(startUs, endUs)` inside an `agg`. */
  def intervalCoverageUs: (Column, Column) => Column = {
    val fn = udaf(new IntervalUnion())
    (s, e) => fn(s, e)
  }

  /** One scored candidate for [[TopK]]. */
  case class Scored(score: Double, id: Long)

  /** Bounded top-k aggregator: keeps the k best (score desc, id asc as
    * tie-break) with FIXED per-group state — each task shuffles at most k
    * rows per group instead of every scored row. This is what makes
    * batched ANN serving scale: a window/rank over queries×corpus scored
    * rows shuffles n·m rows; this shuffles q·k.
    *
    * Buffer is a sorted Seq (worst last); insert is O(k) — fine for the
    * serving-shaped k (tens). */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k >= 1)
    // Spark-SQL sort semantics (nanSafeCompareDoubles): NaN compares
    // greatest (deterministic even with NaN scores), -0.0 == 0.0 (unlike
    // raw Double.compare, which would rank +0.0 above -0.0 and diverge
    // from orderBy/DuckDB ordering); ties broken by id asc
    private def cmpScore(x: Double, y: Double): Int = {
      val xn = java.lang.Double.isNaN(x)
      val yn = java.lang.Double.isNaN(y)
      if ((xn && yn) || x == y) 0
      else if (xn) 1
      else if (yn) -1
      else if (x > y) 1 else -1
    }
    private def better(a: Scored, b: Scored): Boolean = {
      val c = cmpScore(a.score, b.score)
      c > 0 || (c == 0 && a.id < b.id)
    }
    private def insert(buf: Seq[Scored], s: Scored): Seq[Scored] =
      if (buf.size >= k && better(buf.last, s)) buf
      else {
        val (hi, lo) = buf.span(better(_, s))
        (hi :+ s) ++ lo.take(k - hi.size - 1)
      }
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], s: Scored): Seq[Scored] =
      insert(buf, s)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[Scored]): Seq[Scored] = buf
    override def bufferEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** Column form: `topK(k)(score, id)` inside an `agg` — returns an array
    * of (score, id) structs, best first. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopK(k))
    (score, id) => fn(score, id)
  }
}
