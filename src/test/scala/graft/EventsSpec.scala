package graft

import graft.ops.Events

/** Event-sequence analytics: strict-funnel ordering, deadline boundaries,
  * cohort week arithmetic, first-occurrence conversion delay. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, k) => (u, ts(t), k) }
      .toDF("user_id", "ts", "event_type")

  test("funnel: ordered steps, inclusive deadline, pre-step events ignored") {
    val events = ev(
      // u1 completes all three: view 10:00, click 10:30, buy 10:45
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:30:00", "click"),
      (1L, "2024-01-01 10:45:00", "purchase"),
      // u2: click exactly at the 1 h deadline (inclusive) but buys too late
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 10:00:00", "click"),
      (2L, "2024-01-01 11:00:01", "purchase"),
      // u3: click happens BEFORE the first view — order violated, no step 2
      (3L, "2024-01-01 08:00:00", "click"),
      (3L, "2024-01-01 09:00:00", "view"),
      // u4: view only
      (4L, "2024-01-01 12:00:00", "view"))
    val got = Events.funnel(events, Seq("view", "click", "purchase"),
        maxGapSec = 3600L)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("funnel: greedy first-occurrence — deadline runs from the EARLIEST " +
    "qualifying prior step, not the friendliest") {
    // u1's first click (10:05) starts the purchase clock; the purchase at
    // 11:30 misses that clock even though a later click (11:00) would have
    // caught it — strict first-occurrence semantics
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 11:30:00", "purchase"))
    val got = Events.funnel(events, Seq("view", "click", "purchase"),
        maxGapSec = 3600L)
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 1L, 0L))
  }

  test("cohortRetention: Monday-week cohorts, sparse offsets, pre-signup " +
    "activity excluded") {
    val events = ev(
      // 2024-01-01 is a Monday. u1 signs up Wed Jan 3; cohort week Jan 1.
      (1L, "2024-01-03 12:00:00", "signup"),
      (1L, "2024-01-02 12:00:00", "click"), // before cohort week? no —
      // Jan 2 is within cohort week (>= Jan 1) → offset 0
      (1L, "2024-01-20 12:00:00", "view"), // offset 2
      // u2 signs up the next week; one later event at offset 1
      (2L, "2024-01-09 08:00:00", "signup"),
      (2L, "2024-01-16 08:00:00", "purchase"),
      // u3 never signs up — not cohorted
      (3L, "2024-01-05 10:00:00", "view"))
    val got = Events.cohortRetention(events)
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 1L), // u1: signup + Jan-2 click both in week 0
      ("2024-01-01", 2, 1L), // u1 active again offset 2
      ("2024-01-08", 0, 1L), // u2 signup week
      ("2024-01-08", 1, 1L))) // u2 purchase
  }

  test("transitionCounts: consecutive pairs per user, (ts, id) order, " +
    "single-event users produce no transitions") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 1L),
      (1L, ts("2024-01-01 10:05:00"), "click", 2L),
      // same-ts tie broken by event_id: click(2) → view(3)
      (1L, ts("2024-01-01 10:05:00"), "view", 3L),
      (2L, ts("2024-01-01 09:00:00"), "view", 4L),
      (2L, ts("2024-01-01 09:30:00"), "view", 5L),
      (3L, ts("2024-01-01 09:00:00"), "purchase", 6L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Events.transitionCounts(events)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("click", "view", 1L), ("view", "click", 1L),
      ("view", "view", 1L)))
  }

  test("abTest: variants partition users, z defined only for " +
    "non-degenerate pooled rates, sign follows the rate gap") {
    import org.apache.spark.sql.functions.col
    val ev = (1L to 20L).flatMap { u =>
      Seq((u, ts("2024-01-01 10:00:00"), "view", 1.0),
        (u, ts("2024-01-01 11:00:00"), "purchase",
          if (u <= 4) 100.0 else 1.0)) // users 1-4 convert at >50
    }.toDF("user_id", "ts", "event_type", "value")
    val r = Events.abTest(ev,
      col("event_type") === "purchase" && col("value") > 50).head()
    val (ua, ca, ub, cb) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(ua + ub == 20 && ca + cb == 4)
    assert(ua > 0 && ub > 0) // md5 split uses both variants on 20 users
    val z = r.getDouble(6)
    val gap = r.getDouble(4) - r.getDouble(5)
    assert(math.signum(z) == math.signum(gap), s"z=$z gap=$gap")
    // degenerate: nobody converts → NULL z, zero rates
    val none = Events.abTest(ev, col("value") > 1e9).head()
    assert(none.isNullAt(6) && none.getDouble(4) == 0.0)
    // degenerate: everybody converts → NULL z
    val all = Events.abTest(ev, col("value") > 0).head()
    assert(all.isNullAt(6))
  }

  test("sessionStats: gap splits sessions, duration and conversion " +
    "per session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      // 50 min gap > 30 min → new session
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Events.sessionStats(events, gapSeconds = 1800)
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSeq
    assert(got == Seq((1L, 1L, 2L, 600.0, 0), (1L, 2L, 1L, 0.0, 1),
      (2L, 1L, 1L, 0.0, 0)), s"got $got")
  }

  test("hourlyTypeCorrelation: perfect co-movement r=1, anti-movement " +
    "r=-1, zero-variance series yields NULL") {
    // 3 hourly buckets: x = (1,2,3), y = (2,4,6) → r=1; z = (3,2,1) →
    // r(x,z) = -1; w constant → zero variance → NULL r
    val rows = Seq(0, 1, 2).flatMap { h =>
      def at(n: Int, k: String) = (1 to n).map(i =>
        (ts(f"2024-01-01 1$h%d:05:00"), k))
      at(h + 1, "x") ++ at(2 * (h + 1), "y") ++ at(3 - h, "z") ++
        at(2, "w")
    }.toDF("ts", "event_type")
    val got = Events.hourlyTypeCorrelation(rows)
      .orderBy("t_a", "t_b").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(("x", "y")) == Some(1.0))
    assert(got(("x", "z")) == Some(-1.0))
    assert(got(("w", "x")).isEmpty) // constant series: no defined r
  }

  test("sessionBaskets: pair support counts sessions containing both " +
    "types, per-session types deduped") {
    val events = Seq(
      // u1 session 1: view + click (click twice — counted once)
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:06:00"), "click"),
      // u1 session 2 (gap > 30 min): view only — no pair
      (1L, ts("2024-01-01 12:00:00"), "view"),
      // u2 session 1: view + click + purchase → 3 pairs
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 09:10:00"), "click"),
      (2L, ts("2024-01-01 09:20:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Events.sessionBaskets(events, gapSeconds = 1800)
      .orderBy("t_a", "t_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("click", "purchase", 1L), ("click", "view", 2L),
      ("purchase", "view", 1L)), s"got $got")
  }

  test("timeToConvert: minutes floor, only post-view purchases count") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:30:30", "purchase"), // 90.5 min → 90
      (2L, "2024-01-01 10:00:00", "purchase"), // pre-view purchase ignored
      (2L, "2024-01-01 11:00:00", "view"),
      (2L, "2024-01-01 12:30:00", "purchase")) // 90 min
    val got = Events.timeToConvert(events, "view", "purchase")
      .orderBy("delay_minutes").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((90L, 2L)))
  }
}
