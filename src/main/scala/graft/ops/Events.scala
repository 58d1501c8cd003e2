package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over (user, ts, type) streams — funnel
  * conversion and cohort retention, the two standard product-analytics
  * reports (engine extension; the reference's event work stops at
  * per-subject interval logic, which J1-J5/W1-W7 cover).
  *
  * Both operators aggregate BY USER FIRST, so the corpus-sized shuffles
  * key on user_id (one row per user survives each stage) and the final
  * report aggregations run over |users| rows, not |events|. */
object Events {

  /** Strict ordered funnel with a per-step deadline (first-occurrence
    * semantics): a user converts step i when their earliest step-i event
    * lands in `(t_{i-1}, t_{i-1} + maxGapSec]` relative to their chosen
    * step-(i-1) time, starting from their earliest step-1 event. Returns
    * one row per step: (step, event_type, users), step 1-indexed, users
    * monotonically non-increasing.
    *
    * Each stage is a groupBy(user).min(ts) — the event table is filtered
    * to one step's type BEFORE its shuffle, and every later stage joins
    * against an already-aggregated (user, t) frame that only shrinks, so
    * the whole funnel is a chain of progressively smaller user-keyed
    * hash joins (broadcast once below the threshold). One logical plan,
    * no driver-side actions. */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type",
             maxGapSec: Long = 3600L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol)
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(u.as("u")).agg(min(col(tsCol)).as("t"))
    val frames = steps.drop(1).scanLeft(first) { (prev, stepType) =>
      events.filter(col(typeCol) === stepType)
        .select(u.as("u2"), col(tsCol).as("ts2"))
        .join(prev, col("u2") === col("u"))
        .filter(col("ts2") > col("t") &&
          col("ts2") <= col("t") + expr(s"INTERVAL $maxGapSec SECONDS"))
        .groupBy(col("u2").as("u")).agg(min(col("ts2")).as("t"))
    }
    frames.zip(steps).zipWithIndex.map { case ((df, stepType), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(stepType).as("event_type"),
          col("users"))
    }.reduce(_ unionAll _)
  }

  /** Weekly cohort retention: users are cohorted by the Monday-start week
    * of their first `signupType` event; a cohort member is active in week
    * offset w when they have ANY event in `[cohort_week + 7w days,
    * cohort_week + 7(w+1) days)`. Returns (cohort_week, week_offset,
    * active_users); offset 0 is the signup week itself.
    *
    * Plan shape: one user-keyed aggregation for cohorts (|users| rows,
    * broadcastable against the event stream in the common case), one
    * map-side distinct-combine on (cohort, offset, user), and a final
    * count over user-distinct rows — events never shuffle with their
    * payload, only (user, date) pairs do. */
  def cohortRetention(events: DataFrame, signupType: String = "signup",
                      userCol: String = "user_id", tsCol: String = "ts",
                      typeCol: String = "event_type"): DataFrame = {
    val u = col(userCol)
    val cohorts = events.filter(col(typeCol) === signupType)
      .groupBy(u.as("u"))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    events.select(u.as("u2"), col(tsCol).cast("date").as("d"))
      .join(cohorts, col("u2") === col("u"))
      .filter(col("d") >= col("cohort_week"))
      .select(col("cohort_week"),
        floor(datediff(col("d"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"),
        col("u"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("active_users"))
  }

  /** Time-to-convert distribution between two event types, bucketed to
    * minutes: for each user with both events, the delay from first
    * `fromType` to the first `toType` AFTER it. Deterministic
    * first-occurrence semantics, same user-keyed aggregation shape as
    * [[funnel]]. Returns (delay_minutes, users). */
  def timeToConvert(events: DataFrame, fromType: String, toType: String,
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type"): DataFrame = {
    val u = col(userCol)
    val from = events.filter(col(typeCol) === fromType)
      .groupBy(u.as("u")).agg(min(col(tsCol)).as("t0"))
    val to = events.filter(col(typeCol) === toType)
      .select(u.as("u2"), col(tsCol).as("ts2"))
      .join(from, col("u2") === col("u"))
      .filter(col("ts2") > col("t0"))
      .groupBy(col("u"), col("t0")).agg(min(col("ts2")).as("t1"))
    to.select(floor((unix_micros(col("t1")) - unix_micros(col("t0"))) /
        lit(60000000L)).cast("long").as("delay_minutes"))
      .groupBy("delay_minutes").agg(count(lit(1)).as("users"))
  }
}
