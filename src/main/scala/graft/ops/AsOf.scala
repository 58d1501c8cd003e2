package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of / nearest-neighbor temporal joins — the relational re-spec of the
  * reference's positional stream alignment (SURVEY.md §2.3 J4).
  *
  * Spark has no ASOF JOIN; a naive non-equi join explodes to m·n pairs per
  * key. Both operators here use union + window: tag the streams, sort once
  * per key, carry the latest/nearest right row along the ordering, keep
  * left rows. One shuffle on the key, no pair blow-up — survives skewed
  * keys at 100 TB (the window is per-key and streaming-friendly).
  *
  * The right row travels as ONE struct (`_pack`) so every carried field —
  * timestamp and values alike — comes from the same physical row; carrying
  * columns independently with `ignoreNulls` would let a null value column
  * desync from its own timestamp.
  */
object AsOf {

  /** Union of tagged left/right streams: left rows keep their columns and a
    * null pack; right rows contribute only the pack
    * (epoch-µs + value columns). */
  private def tagged(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     rightVals: Seq[String]): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.filterNot(keys.contains).toSeq
    val packType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("rts",
        org.apache.spark.sql.types.LongType) +:
        rightVals.map(c => org.apache.spark.sql.types.StructField(
          c, right.schema(c).dataType)))
    val l = left
      .select(keys.map(col) ++ Seq(col(leftTs).as("_ts"),
        lit(1).as("_side"),
        lit(null).cast(packType).as("_pack")) ++
        leftCols.map(c => col(c).as(s"_l_$c")): _*)
    val r = right
      .select(keys.map(col) ++ Seq(col(rightTs).as("_ts"),
        lit(0).as("_side"),
        struct((unix_micros(col(rightTs)).as("rts") +:
          rightVals.map(col)): _*).as("_pack")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType)
          .as(s"_l_$c")): _*)
    (l.unionByName(r), leftCols)
  }

  /** Shared carry pass for [[asofBackward]]/[[asofForward]]: one
    * direction-ordered window over the tagged union. When several right
    * rows share (key, ts), the pick among them is engine-arbitrary —
    * pre-dedup the right side (e.g. `ohlcBars`-style min_by/max_by or
    * `dedupConsecutive`) when that matters; oracle queries over such a
    * join must use tie-free inputs (q91's are — verified at all three
    * fixture scales). */
  private def asofCarry(left: DataFrame, right: DataFrame,
                        keys: Seq[String], leftTs: String, rightTs: String,
                        rightVals: Seq[String], strict: Boolean,
                        descending: Boolean): DataFrame = {
    val (all, leftCols) = tagged(left, right, keys, leftTs, rightTs,
      rightVals)
    // right rows sort before coincident left rows iff the join is
    // inclusive: side 0 first ⇒ a right row at t is visible to a left row
    // at t. For strict, left first.
    val sideOrder = if (strict) col("_side").desc else col("_side").asc
    val tsOrder = if (descending) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, sideOrder)
      .rowsBetween(Window.unboundedPreceding, 0)
    all
      .withColumn("_carried", last(col("_pack"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(keys.map(col) ++
        leftCols.map(c => col(s"_l_$c").as(c)) ++
        rightVals.map(c => col(s"_carried.$c").as(s"asof_$c")): _*)
  }

  /** Backward as-of join: each left row picks the latest right row with
    * rightTs <= leftTs (or < for `strict`) within the same key. Carried
    * columns are emitted as `asof_<c>` (null when no match).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightVals: Seq[String],
                   strict: Boolean = false): DataFrame =
    asofCarry(left, right, keys, leftTs, rightTs, rightVals, strict,
      descending = false)

  /** Forward as-of join: each left row picks the EARLIEST right row with
    * rightTs >= leftTs (or > for `strict`) within the same key — "time
    * until next event" semantics (next purchase after a view, next error
    * after a deploy). Same union + window machinery as [[asofBackward]],
    * walked in descending time order; one shuffle on the key, no pair
    * blow-up. Carried columns come out as `asof_<c>` (null when no later
    * right row exists). */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightVals: Seq[String],
                  strict: Boolean = false): DataFrame =
    asofCarry(left, right, keys, leftTs, rightTs, rightVals, strict,
      descending = true)

  /** Fixed-interval resampling with forward fill — the time-series
    * normalization step (align irregular sensor/event streams onto a
    * regular grid, carrying the latest observation forward). Generates a
    * per-key grid from floor(min ts) to floor(max ts) at `stepSec`, then
    * [[asofBackward]]s the observations onto it; grid points before the
    * first observation get nulls.
    *
    * The grid generator is one |keys|-row aggregation + a map-side
    * `sequence` explode (rows = span/step per key — the caller prices
    * that); the fill is the as-of union-window, one shuffle on the key.
    * Same 100 TB posture as every as-of here: no pair blow-up, per-key
    * windows. */
  def resampleFfill(df: DataFrame, keys: Seq[String], tsCol: String,
                    vals: Seq[String], stepSec: Long): DataFrame = {
    require(stepSec > 0)
    val stepUs = stepSec * 1000000L
    val floorTs = (c: Column) =>
      timestamp_micros(floor(unix_micros(c) / stepUs).cast("long") * stepUs)
    val grid = df.groupBy(keys.map(col): _*)
      .agg(floorTs(min(col(tsCol))).as("_t0"),
        floorTs(max(col(tsCol))).as("_t1"))
      .select(keys.map(col) :+ explode(sequence(col("_t0"), col("_t1"),
        expr(s"INTERVAL $stepSec SECONDS"))).as("grid_ts"): _*)
    asofBackward(grid, df.select((keys.map(col) :+ col(tsCol)) ++
        vals.map(col): _*),
      keys, "grid_ts", tsCol, vals)
  }

  /** Nearest-neighbor tolerance join — the relational re-spec of the
    * reference's 3-axis timestamp matching (SURVEY.md §7.4-1: closest
    * match within tolerance instead of the greedy cursor sweep). For each
    * left row, picks the right row with minimal |rightTs − leftTs| within
    * `toleranceSec` (ties → the earlier right row).
    *
    * Output: left columns + `nearest_<c>` per rightVal + `nearest_ts` +
    * `nearest_diff_us` (all null when nothing is within tolerance).
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightVals: Seq[String],
                  toleranceSec: Double): DataFrame = {
    val (all, leftCols) = tagged(left, right, keys, leftTs, rightTs,
      rightVals)
    // a right row AT the left timestamp is visible to both passes (diff 0).
    // Both passes use an (unboundedPreceding, current) frame — Spark
    // computes that incrementally in O(n); an unboundedFollowing frame
    // would rescan to partition end per row (O(n^2) on skewed keys). The
    // forward pass just orders time DESCENDING.
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = all
      .withColumn("_b", last(col("_pack"), ignoreNulls = true).over(wb))
      .withColumn("_f", last(col("_pack"), ignoreNulls = true).over(wf))

    val tolUs = (toleranceSec * 1e6).toLong
    val lts = unix_micros(col("_ts"))
    val bDiff = lts - col("_b.rts")
    val fDiff = col("_f.rts") - lts
    val useB = col("_b").isNotNull && bDiff <= tolUs &&
      (col("_f").isNull || fDiff > tolUs || bDiff <= fDiff)
    val useF = !useB && col("_f").isNotNull && fDiff <= tolUs
    val pick = when(useB, col("_b")).when(useF, col("_f"))
    carried.filter(col("_side") === 1)
      .withColumn("_n", pick)
      .select(keys.map(col) ++
        leftCols.map(c => col(s"_l_$c").as(c)) ++
        rightVals.map(c => col(s"_n.$c").as(s"nearest_$c")) ++ Seq(
          timestamp_micros(col("_n.rts")).as("nearest_ts"),
          (lts - col("_n.rts")).cast("long").as("_d")): _*)
      .withColumn("nearest_diff_us", abs(col("_d"))).drop("_d")
  }
}
