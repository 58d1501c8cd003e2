package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the relational re-spec of the
  * reference's positional stream alignment (SURVEY.md §2.3 J4): each left
  * row picks the latest right row with rightTs <= leftTs within the same
  * key.
  *
  * Spark has no ASOF JOIN; a naive non-equi join explodes to m·n pairs per
  * key. The scalable form used here is union + window: tag both streams,
  * sort once per key, carry the last right value forward with
  * `last(ignoreNulls)` over rows unbounded-preceding, keep left rows. One
  * shuffle on the key, no pair blow-up — survives skewed keys at 100 TB
  * (the window is per-key and streaming-friendly).
  */
object AsOf {

  /** @param left      fact stream
    * @param right     reference stream to align against
    * @param keys      equi-join key columns present in both
    * @param leftTs    left timestamp column
    * @param rightTs   right timestamp column
    * @param rightVals right columns to carry (aliased as given)
    * @param strict    true → rightTs < leftTs (exclusive); false → <=
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightVals: Seq[String],
                   strict: Boolean = false): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(keys.map(col) ++ Seq(col("_ts"), col("_side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"_l_$c")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"_r_$c")): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(keys.map(col) ++ Seq(col("_ts"), col("_side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
        rightVals.map(c => col(c).as(s"_r_$c")): _*)

    // right rows sort before coincident left rows iff the join is
    // inclusive (<=): side 0 first ⇒ a right row at t is visible to a left
    // row at t. For strict (<), left first.
    val sideOrder = if (strict) col("_side").desc else col("_side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightVals.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => col(s"_l_$c").as(c)) ++
        rightVals.map(c => col(s"asof_$c")): _*)
  }

  /** Nearest-neighbor tolerance join — the relational re-spec of the
    * reference's 3-axis timestamp matching (SURVEY.md §7.4-1: per-axis
    * closest match within tolerance instead of the greedy cursor sweep).
    * For each left row, picks the right row with minimal |rightTs − leftTs|
    * within `toleranceSec` (ties → earlier right row). Same union+window
    * shape as [[asofBackward]]: one shuffle per key, no pair blow-up.
    *
    * Output columns: left columns + `nearest_<c>` for each rightVal +
    * `nearest_ts` + `nearest_diff_us` (null when nothing within
    * tolerance).
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightVals: Seq[String],
                  toleranceSec: Double): DataFrame = {
    val leftCols = left.columns
    val payload = rightVals :+ "_rts"
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(keys.map(col) ++ Seq(col("_ts"), col("_side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"_l_$c")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"_r_$c")) :+
        lit(null).cast("long").as("_r__rts"): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(keys.map(col) ++ Seq(col("_ts"), col("_side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
        rightVals.map(c => col(c).as(s"_r_$c")) :+
        unix_micros(col(rightTs)).as("_r__rts"): _*)

    // right rows sort before coincident left rows in the backward pass and
    // after them in the forward pass, so a right row AT the left timestamp
    // is visible to both (diff 0)
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").desc)
      .rowsBetween(0, Window.unboundedFollowing)

    val carried = payload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"_b_$c", last(col(s"_r_$c"), ignoreNulls = true).over(wb))
        .withColumn(s"_f_$c", first(col(s"_r_$c"), ignoreNulls = true).over(wf))
    }
    val tolUs = (toleranceSec * 1e6).toLong
    val lts = unix_micros(col("_ts"))
    val bDiff = lts - col("_b__rts")
    val fDiff = col("_f__rts") - lts
    val useB = col("_b__rts").isNotNull && bDiff <= tolUs &&
      (col("_f__rts").isNull || fDiff > tolUs || bDiff <= fDiff)
    val useF = !useB && col("_f__rts").isNotNull && fDiff <= tolUs
    carried.filter(col("_side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => col(s"_l_$c").as(c)) ++
        rightVals.map(c =>
          when(useB, col(s"_b_$c")).when(useF, col(s"_f_$c"))
            .as(s"nearest_$c")) ++ Seq(
          when(useB, timestamp_micros(col("_b__rts")))
            .when(useF, timestamp_micros(col("_f__rts")))
            .as("nearest_ts"),
          when(useB, bDiff).when(useF, fDiff).as("nearest_diff_us")): _*)
  }
}
