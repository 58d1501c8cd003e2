package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for corpus profiling at scale (engine
  * extension). At 100 TB the exact forms are the wrong default: exact
  * distinct shuffles every key and exact quantiles sort the column;
  * HyperLogLog++ and the Greenwald-Khanna sketch aggregate in one pass
  * with map-side partials and fixed-size state. Error bounds are
  * configurable; specs assert them on the test corpus. These are
  * deliberately NOT in the strict-oracle query set — sketch
  * implementations differ across engines by design. */
object Stats {

  /** HyperLogLog++ distinct count; `rsd` = max relative standard
    * deviation (default 5%). */
  def approxDistinct(keys: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(keys, rsd)

  /** Approximate percentiles (Greenwald-Khanna): `accuracy` trades memory
    * for error ≤ 1/accuracy of rank. */
  def approxQuantiles(value: Column, percentiles: Seq[Double],
                      accuracy: Int = 10000): Column =
    percentile_approx(value,
      array(percentiles.map(lit): _*), lit(accuracy))

  /** One-pass per-group profile: count, approx distinct users, approx
    * p50/p95/p99 of `valueCol`. */
  def profile(df: DataFrame, groupCols: Seq[String], keyCol: String,
              valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        approxDistinct(col(keyCol)).as("approx_keys"),
        approxQuantiles(col(valueCol), Seq(0.5, 0.95, 0.99))
          .as("approx_pcts"))

  /** Robust outlier flagging via the modified z-score: a row is an outlier
    * when 0.6745·|x − median| > cutoff·MAD (MAD = median absolute
    * deviation), both statistics per group. Unlike mean/stddev bands
    * (A4's shape), the breakdown point is 50% — the contamination you are
    * hunting cannot drag the threshold. The multiply-through form avoids
    * dividing by MAD, so all-constant groups (MAD = 0) flag any deviation
    * and never divide by zero.
    *
    * Exact medians here (oracle-checkable, interpolated percentile —
    * matching DuckDB's quantile_cont); this is the one exact-statistics
    * member of this object, kept here because the 100 TB swap is the same
    * as [[approxQuantiles]]: replace both percentile calls, keep the
    * two-pass shape — one |groups|-row aggregation per pass, broadcast
    * back, corpus filtered map-side. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  cutoff: Double = 3.5): DataFrame = {
    val v = col(valueCol)
    val gcols = groupCols.map(col)
    val med = df.groupBy(gcols: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = df.join(broadcast(med), groupCols)
    val mad = withMed
      .withColumn("absdev", abs(v - col("med")))
      .groupBy(gcols: _*)
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    withMed.join(broadcast(mad), groupCols)
      .withColumn("is_outlier",
        when(lit(0.6745) * abs(v - col("med")) > lit(cutoff) * col("mad"),
          1).otherwise(0))
  }

  /** Population Stability Index between two cohorts of one numeric
    * column — the standard ML-monitoring drift metric (PSI < 0.1 stable,
    * 0.1-0.25 moderate, > 0.25 action). Rows are split by `cohortCol`
    * (exactly two values expected), binned equal-width by
    * `floor(value / binWidth)`, and PSI sums (p_a − p_b)·ln(p_a/p_b)
    * over bins PRESENT IN BOTH cohorts (inner join — the conservative
    * convention; an epsilon-smoothed variant is a parameter away).
    * Returns one row: (n_bins, psi).
    *
    * One (cohort, bin) count aggregation + a |bins|-row join — corpus
    * scanned once, report is O(1). */
  def psi(df: DataFrame, cohortCol: String, valueCol: String,
          cohortA: String, cohortB: String,
          binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val binned = df
      .filter(col(cohortCol).isin(cohortA, cohortB) &&
        col(valueCol).isNotNull)
      .select(col(cohortCol).as("coh"),
        floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .groupBy("coh", "bin").agg(count(lit(1)).as("n"))
    val tot = binned.groupBy("coh").agg(sum("n").cast("double").as("t"))
    val shares = binned.join(broadcast(tot), "coh")
      .select(col("coh"), col("bin"), (col("n") / col("t")).as("p"))
    shares.filter(col("coh") === cohortA)
      .select(col("bin"), col("p").as("p_a"))
      .join(shares.filter(col("coh") === cohortB)
        .select(col("bin"), col("p").as("p_b")), "bin")
      .agg(count(lit(1)).as("n_bins"),
        round(sum((col("p_a") - col("p_b")) *
          log(col("p_a") / col("p_b"))), 6).as("psi"))
  }

  /** Release-drift report between two snapshots of the same table
    * (yesterday's release vs today's, crawl N vs crawl N+1): one row per
    * watched numeric column with both means, the PSI between the
    * cohort distributions ([[psi]]) and the exact KS distance
    * ([[ksDistance]]) — the one-call dataset-shift gate a release
    * pipeline runs before shipping, bundling the signals the individual
    * operators expose (the [[graft.pipeline.Pipelines.releaseAudit]]
    * pattern applied to drift).
    *
    * The two signals are complementary, which is why both ship: [[psi]]
    * compares shares only over bins BOTH cohorts populate (its inner
    * bin join — q97 semantics), so it sees reweighting within shared
    * support but is blind to mass that moved to entirely new bins;
    * [[ksDistance]]'s CDF supremum catches exactly those disjoint-
    * support shifts. A release gate should alarm on either — and on
    * NULL: a column whose snapshot side is empty or all-NULL reports
    * NULL metrics (never a silently missing row), which is the
    * strongest alarm of all.
    *
    * Scale shape: per column, one binned (cohort, bin) count agg + one
    * value-domain CDF pass — each the component operator's documented
    * shape; |cols| is catalog-sized, so the loop is a driver-side plan
    * builder, not a data loop. Means come from Σv / n divided once. */
  def driftReport(a: DataFrame, b: DataFrame, cols: Seq[String],
                  binWidths: Map[String, Double] = Map.empty,
                  defaultBinWidth: Double = 1.0): DataFrame = {
    require(cols.nonEmpty, "need at least one column to watch")
    val frames = cols.map { c =>
      val v = col(c).cast("double")
      // lazy localCheckpoint (the E4 pattern): the three metric passes
      // below reuse one materialization instead of re-scanning both
      // snapshots, and blocks are reclaimed once the frame is
      // unreferenced — no unpersist obligation on callers
      val tagged = a.select(v.as(c)).withColumn("_coh", lit("a"))
        .unionByName(b.select(v.as(c)).withColumn("_coh", lit("b")))
        .localCheckpoint(false)
      // every piece below is a global agg (ALWAYS one row, null-valued
      // when a side is empty/all-NULL) so a broken snapshot surfaces as
      // a NULL-metric row to alarm on — never as a silently missing row
      val means = tagged.agg(
        (sum(when(col("_coh") === "a", col(c)))
          / count(when(col("_coh") === "a", col(c)))).as("mean_a"),
        (sum(when(col("_coh") === "b", col(c)))
          / count(when(col("_coh") === "b", col(c)))).as("mean_b"))
      val p = psi(tagged, "_coh", c, "a", "b",
        binWidths.getOrElse(c, defaultBinWidth)).select(col("psi"))
      val k = ksDistance(tagged, "_coh", c)
        .agg(round(max(col("ks")), 6).as("ks"))
      means.crossJoin(broadcast(p)).crossJoin(broadcast(k))
        .select(lit(c).as("column"),
          round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          col("psi"), col("ks"))
    }
    frames.reduce(_ unionByName _)
  }

  /** Per-group feature normalization: z-score (population σ built
    * explicitly from Σv and Σv² — NOT `stddev_pop`, whose Welford merge
    * order is engine-specific) and min-max, both as added columns. The
    * feature-scaling step before any distance-based model; one
    * |groups|-row stats aggregation broadcast back, map-side per-row
    * arithmetic. Degenerate groups (σ = 0 or max = min) yield NULL for
    * the affected column rather than a division blow-up. */
  def normalizeByGroup(df: DataFrame, groupCols: Seq[String],
                       valueCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(gcols: _*).agg(
      count(lit(1)).cast("double").as("_n"), sum(v).as("_s"),
      sum(v * v).as("_ss"), min(v).as("_min"), max(v).as("_max"))
    val mean = col("_s") / col("_n")
    val sd = sqrt(col("_ss") / col("_n") - mean * mean)
    val span = col("_max") - col("_min")
    df.join(broadcast(stats), groupCols)
      .withColumn("zscore", when(sd > 0, (v - mean) / sd))
      .withColumn("minmax", when(span > 0, (v - col("_min")) / span))
      .drop("_n", "_s", "_ss", "_min", "_max")
  }

  /** Per-group winsorization: clip `valueCol` into its group's
    * [`lo`, `hi`] quantile band (linear-interpolated, `percentile` ≡
    * DuckDB `quantile_cont`) — the outlier treatment that preserves row
    * count where MAD filtering drops rows; standard before computing
    * means/regressions over heavy-tailed metrics. Same scale shape as
    * [[normalizeByGroup]]: one |groups|-row exact-quantile aggregation
    * (Spark's `percentile` buffers per-group value multisets — at
    * extreme group cardinality swap in `approx_percentile`) broadcast
    * back, then a map-side `greatest(least())` clip; adds `clipped` and
    * an integer `was_clipped` flag. NULL values stay NULL (Spark's
    * least/greatest would otherwise silently rewrite them to the band
    * edge), and a NULL group key is a group like any other (null-safe
    * join), so the row count really is preserved. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad band [$lo, $hi]")
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(gcols: _*).agg(
      expr(s"percentile($valueCol, array($lo, $hi))").as("_q"))
      .select(groupCols.map(c => col(c).as(s"_g_$c")) :+
        element_at(col("_q"), 1).as("_lo") :+
        element_at(col("_q"), 2).as("_hi"): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"_g_$c"))
      .reduce(_ && _)
    df.join(broadcast(stats), cond, "left")
      .withColumn("clipped",
        when(v.isNotNull, greatest(least(v, col("_hi")), col("_lo"))))
      .withColumn("was_clipped",
        when(v < col("_lo") || v > col("_hi"), 1).otherwise(0))
      .drop(groupCols.map(c => s"_g_$c") :+ "_lo" :+ "_hi": _*)
  }

  /** Pairwise two-sample Kolmogorov-Smirnov distance between the
    * per-group distributions of `valueCol`: D = max |F_a(x) − F_b(x)|
    * over the joint value domain, F the empirical CDF — the dataset-card
    * metric for "do these sources/shards draw from the same
    * distribution" (complements [[psi]]'s binned two-cohort drift with
    * an unbinned all-pairs view).
    *
    * Shuffle ledger: one (group, value) count aggregation (map-side
    * combined), a densified |domain|·|groups| frame (broadcast group
    * list — CDFs must step at every joint value or the sup is wrong), a
    * per-group window cumsum, one value-keyed self-join, and a |groups|²
    * report aggregation. CDF values are exact integer cumsums divided
    * once, so engines agree bit-for-bit. */
  def ksDistance(df: DataFrame, groupCol: String,
                 valueCol: String): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("n0"))
    val domain = counts.select("v").distinct()
    val groups = counts.select("g").distinct()
    val dense = domain.crossJoin(broadcast(groups))
      .join(counts, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("n0"), lit(0L)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val tot = counts.groupBy("g").agg(sum("n0").as("t"))
    val cdf = dense
      .withColumn("cum", sum("n").over(w))
      .join(broadcast(tot), "g")
      .select(col("g"), col("v"),
        (col("cum").cast("double") / col("t").cast("double")).as("f"))
    cdf.select(col("v"), col("g").as("g_a"), col("f").as("f_a"))
      .join(cdf.select(col("v"), col("g").as("g_b"), col("f").as("f_b")),
        "v")
      .filter(col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b")
      .agg(max(abs(col("f_a") - col("f_b"))).as("ks"))
  }

  /** CUSUM change-point signal: the running sum of deviations from the
    * group mean, walked in `orderCols` order — drift in the level shows up
    * as |cusum| escaping a band long before any single point looks
    * anomalous (the classic complement to [[madOutliers]]'s point
    * outliers). Adds `cusum` and a `drift` flag (|cusum| > threshold).
    *
    * Two-pass like the other statistics here: a |groups|-row mean
    * aggregation broadcast back, then one per-group window cumsum — the
    * prefix sum is computed incrementally left-to-right, O(n) per group,
    * partitioned by the group key. */
  def cusum(df: DataFrame, groupCols: Seq[String], valueCol: String,
            orderCols: Seq[Column], threshold: Double): DataFrame = {
    val gcols = groupCols.map(col)
    val means = df.groupBy(gcols: _*)
      .agg(avg(col(valueCol)).as("_mean"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    df.join(broadcast(means), groupCols)
      .withColumn("cusum", sum(col(valueCol) - col("_mean")).over(w))
      .withColumn("drift",
        when(abs(col("cusum")) > threshold, 1).otherwise(0))
      .drop("_mean")
  }

  /** KEY-SKEW REPORT — the pre-join/pre-agg diagnostic that decides
    * whether a key needs salting ([[graft.ops.Skew]]) BEFORE the job
    * hits the straggler: the `topK` heaviest keys, each row carrying
    * the corpus totals and the skew factor max/mean = max·n_keys/n_rows
    * (1.0 = perfectly uniform; a factor near the partition count means
    * one task does all the work). One map-side-combined count, a
    * 3-scalar summary riding a broadcast, one bounded take — the
    * diagnostic costs one shuffle of (key, count) pairs at any scale. */
  def skewReport(df: DataFrame, keyCol: String,
                 topK: Int = 5): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val summary = counts.agg(sum("n").as("n_rows"),
      count(lit(1)).as("n_keys"), max("n").as("max_n"))
    counts.orderBy(col("n").desc, col("key"))
      .limit(topK)
      .crossJoin(broadcast(summary))
      .select(col("key"), col("n"), col("n_rows"), col("n_keys"),
        ((col("max_n") * col("n_keys")).cast("double") / col("n_rows"))
          .as("skew_factor"))
  }

  /** SPEARMAN rank correlation with average-rank ties — the monotone-
    * association measure the eval family needs where Pearson misleads
    * (judge scores vs human scores, quality ranks vs downstream loss):
    * rho = Pearson over the two AVERAGE-rank columns. Ranks are
    * computed in DOUBLED units (2·rank + ties − 1 — always an
    * INTEGER, the Krippendorff/Brier exactness recipe), so every sum
    * is an exact LONG and rho is products-of-integer-valued-doubles +
    * ONE sqrt + ONE division — bit-portable across engines and
    * partitionings up to n ≈ 5·10⁴ rows per group (past that the
    * n·Σxy products leave 2^53; rank on a sample or shard the group).
    * Null on zero variance (constant column).
    *
    * Scale shape: two rank windows on (group, value) + one grouped
    * aggregation; only (group, a, b) rows shuffle. Ranking frames are
    * eval-sized by construction — this is not a corpus operator. */
  def spearman(df: DataFrame, aCol: String, bCol: String,
               groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = if (groupCols.nonEmpty) groupCols else Seq("_g")
    val base = (if (groupCols.nonEmpty) df
                else df.withColumn("_g", lit(0)))
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
    def rank2(c: String): Column = {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col(c))
      val ties = Window.partitionBy((keys.map(col) :+ col(c)): _*)
      lit(2L) * rank().over(w).cast("long") +
        count(lit(1)).over(ties) - 1L
    }
    val ranked = base
      .withColumn("_ra", rank2(aCol))
      .withColumn("_rb", rank2(bCol))
    val outKeys = if (groupCols.nonEmpty) groupCols.map(col) else Nil
    val g = ranked.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum("_ra").as("sx"), sum("_rb").as("sy"),
        sum(col("_ra") * col("_ra")).as("sxx"),
        sum(col("_rb") * col("_rb")).as("syy"),
        sum(col("_ra") * col("_rb")).as("sxy"))
    def d(c: String): Column = col(c).cast("double")
    val nd = d("n")
    val vx = nd * d("sxx") - d("sx") * d("sx")
    val vy = nd * d("syy") - d("sy") * d("sy")
    g.select((outKeys :+ col("n") :+
      when(vx > 0 && vy > 0,
        (nd * d("sxy") - d("sx") * d("sy")) / sqrt(vx * vy))
        .as("rho")): _*)
  }

  /** ROC-AUC via the Mann-Whitney rank statistic — the
    * threshold-free companion to the classifier eval family
    * (calibrationBins/ECE/Brier measure probability QUALITY; AUC
    * measures RANKING power, the number a quality-classifier gate is
    * actually chosen by). Average-rank tie handling through the
    * [[spearman]] doubled-unit recipe (2·rank + ties − 1, always an
    * INTEGER), so AUC = (ΣR2_pos − n_pos(n_pos+1)) / (2·n_pos·n_neg)
    * is exact-integer sums + ONE IEEE division — bit-portable across
    * engines and partitionings. NULL when a group lacks positives or
    * negatives (AUC undefined — never a fake 0.5).
    *
    * Scale shape: one rank window on (group, score) + one grouped
    * aggregation; only (group, label, score) rows shuffle — an
    * eval-sized frame by construction, not a corpus operator. */
  /** GINI concentration of a non-negative LONG measure — the
    * inequality number data-mixing reports lead with (domain share
    * concentration, per-source token mass, dedup cluster sizes):
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the ascending sort,
    * i = 1..n. Ties are order-invariant inside the sum (equal values
    * swap freely), every sum is an exact LONG, and G is ONE IEEE
    * division — bit-portable. NULL when the group's mass is zero or
    * any value is negative (Gini undefined — never a silent clamp).
    *
    * Scale shape: one rank window on (group, value) + one grouped
    * aggregation — the q98 percent-rank class; only (group, value)
    * rows shuffle. */
  def gini(df: DataFrame, valueCol: String,
           groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = if (groupCols.nonEmpty) groupCols else Seq("_g")
    val base = (if (groupCols.nonEmpty) df
                else df.withColumn("_g", lit(0)))
      .filter(col(valueCol).isNotNull)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(valueCol))
    val g = base
      .withColumn("_i", row_number().over(w).cast("long"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("s"),
        sum(col("_i") * col(valueCol).cast("long")).as("a"),
        min(col(valueCol).cast("long")).as("_min"))
    val outKeys = if (groupCols.nonEmpty) groupCols.map(col) else Nil
    g.select((outKeys :+ col("n") :+
      when(col("s") > 0 && col("_min") >= 0,
        (lit(2L) * col("a") - (col("n") + 1L) * col("s"))
          .cast("double") / (col("n") * col("s")).cast("double"))
        .as("gini")): _*)
  }

  def rocAuc(df: DataFrame, labelCol: String = "label",
             scoreCol: String = "score",
             groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = if (groupCols.nonEmpty) groupCols else Seq("_g")
    val base = (if (groupCols.nonEmpty) df
                else df.withColumn("_g", lit(0)))
      .filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(scoreCol))
    val ties = Window.partitionBy((keys.map(col) :+ col(scoreCol)): _*)
    val r2 = lit(2L) * rank().over(w).cast("long") +
      count(lit(1)).over(ties) - 1L
    val pos = (col(labelCol) === 1).cast("long")
    val g = base.withColumn("_r2", r2)
      .groupBy(keys.map(col): _*)
      .agg(sum(pos).as("n_pos"),
        sum(lit(1L) - pos).as("n_neg"),
        sum(col("_r2") * pos).as("s2_pos"))
    val outKeys = if (groupCols.nonEmpty) groupCols.map(col) else Nil
    g.select((outKeys :+ col("n_pos") :+ col("n_neg") :+
      when(col("n_pos") > 0 && col("n_neg") > 0,
        (col("s2_pos") - col("n_pos") * (col("n_pos") + 1L))
          .cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
        .as("auc")): _*)
  }
}
