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

  /** First-order transition matrix over per-user event sequences: count
    * every consecutive (from_type → to_type) pair walking each user's
    * events in (ts, event_id) order — the Markov-chain view of user
    * behavior (next-step prediction, anomalous-flow detection).
    *
    * One lag window keyed on user (per-user history fits a task by the
    * same argument as every W-row), then a map-side-combined count over
    * the |types|² transition domain — the corpus-sized shuffle carries
    * (user, ts, type) triples once, and the report aggregation moves
    * |types|² rows. Returns (from_type, to_type, n). */
  def transitionCounts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", typeCol: String = "event_type",
                       tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("from_type", lag(col(typeCol), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Deterministic A/B experiment readout: users are assigned to 2
    * variants by the portable md5 hash bucket ([[graft.text.TextOps
    * .hashBucket]] — the same assignment any engine in the platform
    * computes), a user converts when they have ≥1 event satisfying
    * `convPredicate`, and the result is one row with per-variant counts,
    * rates, and the two-proportion z-statistic (pooled standard error;
    * NULL when the pooled rate is degenerate — all or none converted —
    * instead of a division by zero).
    *
    * Everything aggregates by user first (|users| rows), then collapses
    * to a single row — the z arithmetic runs on the driver-bound 1-row
    * frame, not per event. */
  def abTest(events: DataFrame, convPredicate: Column,
             userCol: String = "user_id"): DataFrame = {
    val u = col(userCol)
    val assigned = events.select(u.as("u")).distinct()
      .withColumn("variant",
        graft.text.TextOps.hashBucket(col("u"), 2))
    val conv = events.filter(convPredicate)
      .select(u.as("u")).distinct().withColumn("c", lit(1))
    val perUser = assigned.join(conv, Seq("u"), "left")
      .select(col("variant"), coalesce(col("c"), lit(0)).as("c"))
    val counts = perUser.agg(
      sum(when(col("variant") === 0, 1).otherwise(0)).as("users_a"),
      sum(when(col("variant") === 0, col("c")).otherwise(0)).as("conv_a"),
      sum(when(col("variant") === 1, 1).otherwise(0)).as("users_b"),
      sum(when(col("variant") === 1, col("c")).otherwise(0)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("users_a")
    val pb = col("conv_b").cast("double") / col("users_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("users_a") + col("users_b"))
    val nConv = col("conv_a") + col("conv_b")
    val nUsers = col("users_a") + col("users_b")
    counts.select(col("users_a"), col("conv_a"), col("users_b"),
      col("conv_b"), round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      when(nConv > 0 && nConv < nUsers,
        round((pa - pb) /
          sqrt(pooled * (lit(1.0) - pooled) *
            (lit(1.0) / col("users_a") + lit(1.0) / col("users_b"))), 6))
        .as("z"))
  }

  /** Session-level rollup: sessionize each user's stream on an inactivity
    * gap ([[graft.ops.Windows.sessionize]]'s W5 shape at product-analytics
    * timescales), then aggregate one row per session — event count,
    * wall-clock duration, and a converted flag (≥1 `convType` event in the
    * session). The standard unit of engagement analysis.
    *
    * One user-keyed window pass plus one (user, session) aggregation —
    * both shuffles key on the user; session rows ≪ event rows. */
  def sessionStats(events: DataFrame, gapSeconds: Double = 1800,
                   convType: String = "purchase",
                   userCol: String = "user_id", tsCol: String = "ts",
                   typeCol: String = "event_type"): DataFrame = {
    val s = Windows.sessionize(events, tsCol, Seq(userCol), gapSeconds)
    s.groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        round((unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          / lit(1000000.0), 3).as("duration_sec"),
        max(when(col(typeCol) === convType, 1).otherwise(0))
          .as("converted"))
  }

  /** Pairwise Pearson correlation between per-bucket event-type counts —
    * which metrics move together hour by hour (co-incident errors and
    * purchases, cannibalizing features). Computed EXPLICITLY from the
    * integer sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²), never an
    * engine-internal corr() — the integer sums are exact in any engine
    * and the closing formula is a handful of IEEE ops, so results are
    * reproducible bit-for-bit where a streaming Welford corr is not.
    *
    * Shuffle ledger: one (bucket) aggregation with a conditional count
    * per type (map-side combined), a bucket-keyed self-join of the tall
    * (bucket, type, n) frame — |buckets|·|types| rows — and a |types|²
    * report aggregation. */
  def hourlyTypeCorrelation(events: DataFrame, bucketSeconds: Long = 3600L,
                            tsCol: String = "ts",
                            typeCol: String = "event_type"): DataFrame = {
    val counts = events
      .groupBy(TimeOps.timeBucket(col(tsCol), bucketSeconds).as("h"),
        col(typeCol).as("t"))
      .agg(count(lit(1)).as("n0"))
    // densify: every (bucket, type) cell, zero-filled — correlation over
    // sparse rows would silently skip the hours one series sat at zero
    val buckets = counts.select("h").distinct()
    val types = counts.select("t").distinct()
    val dense = buckets.crossJoin(broadcast(types))
      .join(counts, Seq("h", "t"), "left")
      .select(col("h"), col("t"), coalesce(col("n0"), lit(0L)).as("n"))
    val pairs = dense.select(col("h"), col("t").as("t_a"),
        col("n").as("x"))
      .join(dense.select(col("h"), col("t").as("t_b"), col("n").as("y")),
        "h")
      .filter(col("t_a") < col("t_b"))
    val stats = pairs.groupBy("t_a", "t_b")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    // close the formula in DOUBLE: n·sxx products overflow Long silently
    // in Spark (and loudly in other engines) once sums pass ~1e18; double
    // products stay IEEE-identical across engines and exact below 2^53
    val n = col("n").cast("double"); val sx = col("sx").cast("double")
    val sy = col("sy").cast("double"); val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val num = n * sxy - sx * sy
    val denA = n * sxx - sx * sx
    val denB = n * syy - sy * sy
    stats.select(col("t_a"), col("t_b"), col("n"),
      when(denA > 0 && denB > 0,
        round(num / (sqrt(denA) * sqrt(denB)), 6)).as("r"))
  }

  /** Market-basket analysis over sessions: for every unordered pair of
    * event types, the number of sessions in which BOTH occur — the
    * behavioral co-occurrence matrix ("users who error in a session also
    * purchase in it"). Sessions come from [[Windows.sessionize]]'s gap
    * rule; the pair generation runs per session over its ≤|types|
    * DISTINCT types, so cost is bounded by |sessions|·|types|², never by
    * event volume. */
  def sessionBaskets(events: DataFrame, gapSeconds: Double = 1800,
                     userCol: String = "user_id", tsCol: String = "ts",
                     typeCol: String = "event_type"): DataFrame = {
    // one grouped aggregation + ordered pair expansion (the dedup
    // pair-generator shape): collect_set ≡ the former distinct, and the
    // (u, sid) grouping rides the sessionize window's user partitioning
    // — the former self-join re-derived the window on both sides and
    // paid two more exchanges. Pair multiset identical: sorted distinct
    // types expanded a-before-b ≡ the t_a < t_b join filter.
    val baskets = Windows.sessionize(events, tsCol, Seq(userCol),
        gapSeconds)
      .groupBy(col(userCol).as("u"), col("session_id").as("sid"))
      .agg(array_sort(collect_set(col(typeCol))).as("ts"))
      .filter(size(col("ts")) >= 2)
    baskets
      .select(col("ts").as("_ms"), posexplode(col("ts")).as(Seq("_i", "t_a")))
      .select(col("t_a"), explode(slice(col("_ms"), col("_i") + 2,
        size(col("_ms")) - col("_i") - 1)).as("t_b"))
      .groupBy("t_a", "t_b").agg(count(lit(1)).as("support"))
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
