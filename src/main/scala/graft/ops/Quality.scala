package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test / Great-
  * Expectations shape as one engine operator (engine extension; the
  * reference's only quality mechanism is ad-hoc range clamps, SURVEY.md
  * §2.2 P3).
  *
  * All row-level checks evaluate in a SINGLE aggregation pass over the
  * frame (one conditional-sum column per check, map-side combined), plus
  * one distinct-count per uniqueness column — there is no per-check scan,
  * so a 50-check suite on 100 TB still reads the data once. The report is
  * |checks| rows.
  */
object Quality {

  /** One row per expectation: (check, total, violations, pass).
    *
    * @param checks (name, predicate) — a row VIOLATES when the predicate
    *               is false OR null (null comparisons count as failures,
    *               matching SQL CASE semantics)
    * @param uniqueCols columns that must be unique; violations =
    *                   total − exact distinct count
    */
  def expectationsReport(df: DataFrame, checks: Seq[(String, Column)],
                         uniqueCols: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueCols.nonEmpty,
      "expectationsReport needs at least one check")
    // coalesce: sum() over an empty frame is NULL, which would report a
    // vacuously-true check as FAILED with a NULL violation count
    val violationCols = checks.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(pred, 0L).otherwise(1L)), lit(0L)).as(s"_v$i")
    }
    val distinctCols = uniqueCols.zipWithIndex.map { case (c, i) =>
      countDistinct(col(c)).as(s"_d$i")
    }
    val aggd = df.agg(count(lit(1)).as("_total"),
      (violationCols ++ distinctCols): _*)
    val rows = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check"), col("_total").as("total"),
        col(s"_v$i").as("violations"))
    } ++ uniqueCols.zipWithIndex.map { case (c, i) =>
      struct(lit(s"unique_$c").as("check"), col("_total").as("total"),
        (col("_total") - col(s"_d$i")).as("violations"))
    }
    aggd
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.total").as("total"),
        col("r.violations").as("violations"),
        when(col("r.violations") === 0, 1).otherwise(0).as("pass"))
  }

  /** STAGE-1 GATE AUDIT — the funnel report curation debugging needs:
    * for each map-only gate, how many docs it flags (`n_flagged`), how
    * many it flags ALONE (`n_marginal` — what relaxing just that gate
    * would win back), plus the `all_pass` survivor row (both columns =
    * survivors there). ONE scan, the [[expectationsReport]] class:
    * every gate is a conditional-sum column in a single
    * map-side-combined aggregation; the report is |gates|+1 rows. */
  def gateAudit(docs: DataFrame, minQuality: Double = 0.3,
                lang: String = "en",
                textCol: String = "text"): DataFrame = {
    import graft.text.TextOps
    val t0 = col(textCol)
    val fNull = t0.isNull || length(t0) === 0
    val fQ = !fNull && TextOps.qualityScore(t0) < minQuality
    val fL = !fNull && TextOps.langIdEn(t0) =!= lang
    // coalesce: a zero-row input must report ZEROS, not a null funnel
    def cnt(c: Column): Column =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val agg = docs
      .select(fNull.as("f_null"), fQ.as("f_q"), fL.as("f_l"))
      .agg(cnt(col("f_null")).as("c_null"),
        cnt(col("f_q")).as("c_q"),
        cnt(col("f_l")).as("c_l"),
        cnt(col("f_null") && !col("f_q") && !col("f_l")).as("m_null"),
        cnt(col("f_q") && !col("f_null") && !col("f_l")).as("m_q"),
        cnt(col("f_l") && !col("f_null") && !col("f_q")).as("m_l"),
        cnt(!col("f_null") && !col("f_q") && !col("f_l")).as("pass"))
    agg.select(explode(array(
        struct(lit("null_text").as("gate"),
          col("c_null").as("n_flagged"), col("m_null").as("n_marginal")),
        struct(lit("quality").as("gate"),
          col("c_q").as("n_flagged"), col("m_q").as("n_marginal")),
        struct(lit("lang").as("gate"),
          col("c_l").as("n_flagged"), col("m_l").as("n_marginal")),
        struct(lit("all_pass").as("gate"),
          col("pass").as("n_flagged"), col("pass").as("n_marginal"))))
        .as("r"))
      .select(col("r.gate").as("gate"),
        col("r.n_flagged").as("n_flagged"),
        col("r.n_marginal").as("n_marginal"))
  }

  /** KRIPPENDORFF'S ALPHA (nominal) — the agreement coefficient the
    * kappa pair can't give: it tolerates MISSING ratings (incomplete
    * rater×item matrices are the judge-eval norm — fleissKappa needs a
    * constant rater count per item, cohenKappa exactly two raters).
    * α = 1 − D_o/D_e over the coincidence matrix; items with fewer
    * than two ratings carry no signal and are excluded (reported).
    *
    * Numerics — EXACT integers end to end: per-item disagreement
    * mᵤ² − Σc n_uc² is integer; the 1/(mᵤ−1) weights clear through
    * L = lcm(1…maxRaters−1), so D_o·L is one exact integer sum;
    * marginals n_c and D_e's n² − Σn_c² are integers; α is ONE
    * division at the edge — bit-portable across engines and
    * partitionings (the Brier recipe).
    *
    * Scale shape: (item, value) partial-agged counts → one per-item
    * aggregation → |values|-row marginals + a 1-row reduction —
    * the vocabulary ledger class; rating payloads never shuffle. */
  def krippendorffAlpha(df: DataFrame, itemCol: String = "item_id",
                        valueCol: String = "label",
                        maxRaters: Int = 12): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 24,
      s"maxRaters out of range: $maxRaters")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val L = (1L to (maxRaters - 1).toLong)
      .reduce((a, b) => a / gcd(a, b) * b)
    val counts = df
      .filter(col(itemCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(itemCol).as("u"), col(valueCol).as("c"))
      .agg(count(lit(1)).as("n_uc"))
    val perItem = counts.groupBy("u")
      .agg(sum("n_uc").as("m_u"),
        sum(col("n_uc") * col("n_uc")).as("sq"))
      .filter(col("m_u") >= 2)
    // hard contract: L must clear every 1/(m_u − 1)
    val overMax = perItem.filter(col("m_u") > maxRaters).limit(1)
      .collect()
    require(overMax.isEmpty,
      s"an item carries more than maxRaters=$maxRaters ratings — " +
        "raise maxRaters (L must clear every 1/(m_u - 1))")
    val doL = perItem
      // L div (m_u − 1) is exact: L is a multiple of every m_u − 1 by
      // the maxRaters contract (Spark's / would go through DOUBLE)
      .select(((col("m_u") * col("m_u") - col("sq")) *
        expr(s"$L div (m_u - 1)")).as("d"))
      .agg(coalesce(sum("d"), lit(0L)).as("d_o_l"),
        count(lit(1)).as("n_items_used"))
    val marg = counts.join(perItem.select("u"), Seq("u"), "left_semi")
      .groupBy("c").agg(sum("n_uc").as("n_c"))
      .agg(coalesce(sum("n_c"), lit(0L)).as("n"),
        coalesce(sum(col("n_c") * col("n_c")), lit(0L)).as("sq_c"))
    doL.crossJoin(broadcast(marg))
      .select(col("n_items_used"), col("n"), col("d_o_l"),
        (col("n") * col("n") - col("sq_c")).as("d_e_num"))
      .withColumn("alpha",
        when(col("d_e_num") > 0,
          // multiply in DOUBLE: d_o_l already carries the L scale, so
          // (n−1)·d_o_l as a LONG product wraps silently near 10^7
          // pairable items under non-ANSI Spark — exactness is already
          // lost at this edge division, so the cast costs nothing
          lit(1.0) - (col("n") - 1).cast("double") *
            col("d_o_l").cast("double")
            / (lit(L.toDouble) * col("d_e_num").cast("double"))))
  }

  /** k-anonymity audit over a quasi-identifier column set: a record is
    * at risk when its quasi-identifier combination is shared by fewer
    * than `k` records (re-identification by linkage — the governance
    * counterpart of [[graft.text.TextOps]]'s PII scrub, which removes
    * direct identifiers but cannot see combination risk). One summary
    * row: total rows, distinct combinations, combinations and rows below
    * k, the at-risk row fraction, and the smallest class size.
    *
    * Scale shape: one map-side-combined groupBy on the quasi columns
    * (|combinations| rows — the quasi domain, orders below the corpus),
    * then a |combinations|-row summary agg. Nothing else moves. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 k: Int = 5): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k below 2 makes every record anonymous")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(sum("_n").as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("_n") < k, 1L).otherwise(0L)).as("groups_below_k"),
        coalesce(sum(when(col("_n") < k, col("_n"))), lit(0L))
          .as("rows_below_k"),
        min("_n").as("min_group_size"))
      .select(col("n_rows"), col("n_groups"), col("groups_below_k"),
        col("rows_below_k"),
        round(col("rows_below_k").cast("double") / col("n_rows"), 6)
          .as("at_risk_fraction"),
        col("min_group_size"))
  }

  /** The remediation view of [[kAnonymity]]: the quasi-identifier
    * combinations below `k`, smallest first — what to generalize or
    * suppress. Same single-aggregation shape, filtered to violations. */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Int = 5): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .filter(col("group_n") < k)
  }

  /** Snapshot diff — dataset versioning's core primitive: classify every
    * id across two corpus snapshots as added / removed / changed /
    * unchanged, where "changed" compares an md5 fingerprint of
    * `compareCols` (cast to string, \u0001-joined — the same portable
    * content-hash convention as the dedup digests).
    *
    * Scale shape: fingerprints are computed map-side on each snapshot, so
    * the only thing that moves is (id, 32-char fp) — never the document
    * payload — into one id-keyed full-outer join: two hash exchanges, the
    * provable minimum for an unordered key-compare of two tables. On
    * bucketed/pre-partitioned snapshots even those disappear. Output:
    * (id, old_fp, new_fp, status). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   idCol: String = "doc_id",
                   compareCols: Seq[String] = Seq("text")): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    def fp(df: DataFrame, as: String) = df.select(col(idCol),
      md5(concat_ws("\u0001",
        compareCols.map(c => col(c).cast("string")): _*)).as(as))
    fp(oldDf, "old_fp")
      .join(fp(newDf, "new_fp"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged"))
  }

  /** L-DIVERSITY audit — [[kAnonymity]]'s stronger sibling (Machanavajjhala
    * et al. 2007): a quasi-identifier group can be k-anonymous yet leak
    * the sensitive attribute outright if every member shares one value.
    * Reports, over the quasi-identifier groups: group count, groups whose
    * DISTINCT sensitive-value count falls below `l`, the rows inside
    * them, the at-risk fraction (exact quotient, q-rounded like
    * kAnonymity's), and the minimum diversity seen. Same single
    * aggregation-pass shape as kAnonymity with one extra
    * `count_distinct`. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 2, "l below 2 makes every group diverse")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        count_distinct(col(sensitiveCol)).as("_d"))
      .agg(sum("_n").as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("_d") < l, 1L).otherwise(0L)).as("groups_below_l"),
        coalesce(sum(when(col("_d") < l, col("_n"))), lit(0L))
          .as("rows_below_l"),
        min("_d").as("min_diversity"))
      .select(col("n_rows"), col("n_groups"), col("groups_below_l"),
        col("rows_below_l"),
        round(col("rows_below_l").cast("double") / col("n_rows"), 6)
          .as("at_risk_fraction"),
        col("min_diversity"))
  }

  /** T-CLOSENESS audit — the third rung of the privacy ladder (Li, Li &
    * Venkatasubramanian, ICDE 2007) after [[kAnonymity]] and
    * [[lDiversity]]: a k-anonymous, l-diverse group still leaks under
    * skewness/similarity attacks when its sensitive-value DISTRIBUTION
    * sits far from the corpus-wide one. For an ORDERED sensitive
    * attribute the paper's distance is the Earth Mover's Distance under
    * the ordered metric: with the global value domain v_1 < … < v_m,
    * EMD(P, Q) = (1/(m−1)) · Σ_{i<m} |Σ_{j≤i} (P_j − Q_j)|.
    *
    * Numerics: everything up to the final quotient is EXACT 64-bit
    * integer arithmetic. The cumulative term at value i is scaled by
    * n_g·N (group size × corpus size): D_i = Σ_{j≤i} (c_j·N − C_j·n_g),
    * so EMD = Σ_i |D_i| / (n_g·N·(m−1)) is ONE IEEE division of exact
    * integers (bit-portable across engines), and the t threshold is
    * applied by integer cross-multiplication (tDen·Σ|D_i| > tNum·den) —
    * no float ever decides a flag. (|D_i| ≤ n_g·N and Σ|D_i| ≤ m·n_g·N,
    * far inside long range for any single-table audit; the i=m term is
    * identically 0 so summing all m cumulants equals the paper's i<m
    * sum.) Rows with a NULL sensitive value are excluded up front —
    * NULL is not a position on the ordered metric.
    *
    * Output: one row per quasi-identifier group — the quasi columns,
    * group_n, emd_num (the exact integer numerator Σ|D_i|), emd, and
    * above_t (1 when EMD > tNum/tDen: the groups to generalize or
    * suppress).
    *
    * Scale shape: one groupBy on (quasi, sens) (|groups|·|values-seen|
    * rows), one |values|-row global agg (broadcast), one |groups|-row
    * agg; the dense group × value-domain grid is |groups|·m rows — two
    * bounded domains, orders below the corpus — cumulated by one
    * integer window per group. The corpus is read once; no corpus-sized
    * shuffle exists anywhere in the plan. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, tNum: Long = 3,
                 tDen: Long = 20): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(tDen > 0 && tNum >= 0, "t must be a non-negative rational")
    val d = df.filter(col(sensitiveCol).isNotNull)
    val qs = quasiCols.map(col)
    val cells = d.groupBy((qs :+ col(sensitiveCol).as("_v")): _*)
      .agg(count(lit(1)).as("_c"))
    val global = d.groupBy(col(sensitiveCol).as("_v"))
      .agg(count(lit(1)).as("_gc"))
    val totals = d.agg(count(lit(1)).as("_n_total"),
      count_distinct(col(sensitiveCol)).as("_m"))
    val groups = d.groupBy(qs: _*).agg(count(lit(1)).as("group_n"))
    val w = Window.partitionBy(qs: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups
      .crossJoin(broadcast(global))
      .join(cells, quasiCols :+ "_v", "left")
      .crossJoin(broadcast(totals))
      .withColumn("_term",
        coalesce(col("_c"), lit(0L)) * col("_n_total")
          - col("_gc") * col("group_n"))
      .withColumn("_cum", sum(col("_term")).over(w))
      .groupBy((qs :+ col("group_n") :+ col("_n_total") :+ col("_m")): _*)
      .agg(sum(abs(col("_cum"))).as("emd_num"))
      .withColumn("_den",
        col("group_n") * col("_n_total") * greatest(col("_m") - 1, lit(1L)))
      .select((qs :+ col("group_n") :+ col("emd_num") :+
        (col("emd_num").cast("double") / col("_den").cast("double"))
          .as("emd") :+
        when(col("emd_num") * tDen > col("_den") * tNum, 1)
          .otherwise(0).as("above_t")): _*)
  }

  /** FLEISS' KAPPA — [[cohenKappa]] generalized past two raters: m
    * raters per item (not necessarily the SAME two), long-format
    * (item, rater, label) input — the agreement gate for consensus-
    * labeled corpora (3-way adjudication, LLM-judge ensembles). One
    * summary row: item count, items dropped for having ≠ m ratings
    * (Fleiss assumes a constant panel size; partial panels are reported,
    * not silently mixed in), observed agreement P̄ = Σ_i(Σ_j n_ij² − m)
    * / (N·m·(m−1)) and chance agreement P̄e = Σ_j c_j² / (N·m)² — each
    * ONE division over exact-integer sums — and κ = (P̄−P̄e)/(1−P̄e),
    * NULL when P̄e = 1 (all raters constant). Integer headroom: c_j² in
    * LONG is ANSI-loud past N·m ≈ 3×10⁹ ratings, far past any panel.
    *
    * Scale shape: one (item, label) grouped count, one per-item agg,
    * one |labels|-row agg, three 1-row reductions — all partial-agged;
    * nothing wider than the ratings scan. */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
                  labelCol: String, m: Int): DataFrame = {
    require(m >= 2, "Fleiss' kappa needs at least two raters per item")
    val rated = df.filter(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .select(col(itemCol).as("_i"), col(labelCol).cast("string").as("_l"))
    val perItem = rated.groupBy("_i").agg(count(lit(1)).as("_mi"))
    val kept = rated.join(perItem.filter(col("_mi") === m), Seq("_i"))
    val nij = kept.groupBy("_i", "_l").agg(count(lit(1)).as("_n"))
    val aNum = nij.groupBy("_i")
      .agg((sum(col("_n") * col("_n")) - m).as("_a"))
      .agg(sum("_a").as("a_num"), count(lit(1)).as("n_items"))
    val s2 = nij.groupBy("_l").agg(sum("_n").as("_c"))
      .agg(sum(col("_c") * col("_c")).as("s2"))
    val dropped = perItem.filter(col("_mi") =!= m)
      .agg(count(lit(1)).as("n_dropped"))
    val nm = col("n_items") * m
    val pBar = col("a_num").cast("double") /
      (nm * (m - 1)).cast("double")
    val pE = col("s2").cast("double") /
      (nm.cast("double") * nm.cast("double"))
    aNum.crossJoin(broadcast(s2)).crossJoin(broadcast(dropped))
      .select(col("n_items"), coalesce(col("n_dropped"), lit(0L))
        .as("n_dropped"),
        pBar.as("p_bar"), pE.as("p_e"),
        when(lit(1.0) - pE =!= 0.0, (pBar - pE) / (lit(1.0) - pE))
          .otherwise(lit(null).cast("double")).as("kappa"))
  }

  /** COHEN'S KAPPA inter-annotator agreement — the label-quality gate a
    * human-annotated (or LLM-judged) training corpus runs before anyone
    * trusts the labels: observed agreement corrected for the agreement
    * two raters would reach by chance from their own label marginals,
    * κ = (p_o − p_e)/(1 − p_e). One row per group (rating batch, task,
    * source): item count, raw agreement count, p_o, p_e, and κ — NULL
    * when p_e = 1 (both raters constant: chance correction is 0/0 and no
    * agreement statistic is defined). Items where either label is NULL
    * are excluded (unrated ≠ disagreement).
    *
    * Bit-portable: every count is an exact integer; Σ_k r_k·c_k stays in
    * LONG arithmetic (associative — no float fold needed; ANSI overflow
    * would be loud at ~3×10⁹ double-labeled items in ONE group, far past
    * any human-annotation batch); p_o, p_e, κ are IEEE products/quotients
    * in a fixed shape on both engines. Unrounded by the exact-quotient
    * rule.
    *
    * Scale shape: two (group, label) grouped counts + one grouped
    * agreement pass over the corpus — all partial-agged; the marginal
    * join lives on the (groups × labels) domain, orders below the item
    * count (label domains are small by construction — raters pick from
    * a rubric). No corpus-sized join anywhere. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String,
                 groupCols: Seq[String] = Nil): DataFrame = {
    val keys = if (groupCols.nonEmpty) groupCols else Seq("_g")
    val labeled = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val base = (if (groupCols.nonEmpty) labeled
                else labeled.withColumn("_g", lit(0)))
      .select((keys.map(col) :+ col(aCol).cast("string").as("_a") :+
        col(bCol).cast("string").as("_b")): _*)
    val stats = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("_a") === col("_b"), 1L).otherwise(0L)).as("n_agree"))
    val ra = base.groupBy((keys.map(col) :+ col("_a").as("_lab")): _*)
      .agg(count(lit(1)).as("_rk"))
    val cb = base.groupBy((keys.map(col) :+ col("_b").as("_lab")): _*)
      .agg(count(lit(1)).as("_ck"))
    val chance = ra.join(cb, keys :+ "_lab")
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_rk") * col("_ck")).as("_s"))
    val nd = col("n_items").cast("double")
    // left join + coalesce: disjoint label sets (S = 0) must still
    // report the group (pe = 0, kappa = po), not drop it
    val sd = coalesce(col("_s"), lit(0L)).cast("double")
    val outKeys = if (groupCols.nonEmpty) groupCols.map(col) else Nil
    stats.join(chance, keys, "left")
      .select((outKeys :+ col("n_items") :+ col("n_agree") :+
        (col("n_agree").cast("double") / nd).as("po") :+
        (sd / (nd * nd)).as("pe") :+
        when(nd * nd - sd =!= 0.0,
          (nd * col("n_agree").cast("double") - sd) / (nd * nd - sd))
          .otherwise(lit(null).cast("double")).as("kappa")): _*)
  }

  /** McNEMAR'S TEST over paired per-item correctness — the eval-harness
    * question the accuracy delta alone cannot answer: did system B
    * genuinely beat system A, or did the two just disagree randomly?
    * Only the DISCORDANT pairs carry signal: b = items A got right and
    * B wrong, c = the reverse. One summary row: n, n_both_right,
    * n_both_wrong, b, c, and the continuity-corrected statistic
    * χ² = (|b−c|−1)²/(b+c) (Edwards' correction — the standard eval
    * form; 1 df, 3.841 ≈ p 0.05), null when b = c = 0 (no discordance,
    * no evidence either way). For b+c < ~25 the exact binomial on
    * (b, b+c) is the textbook fallback — b and c are in the output
    * precisely so a caller can apply it.
    *
    * Bit-portable: four exact-integer conditional sums (the Brier
    * recipe), ONE division at the edge. Scale shape: one
    * map-side-combined aggregation over the corpus; nothing else
    * moves. */
  def mcnemar(df: DataFrame, aCol: String = "a_correct",
              bCol: String = "b_correct"): DataFrame = {
    val labeled = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val a = col(aCol).cast("long"); val b0 = col(bCol).cast("long")
    // coalesce: an all-null or empty frame reports zeros, not nulls
    labeled
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(a === 1L && b0 === 1L, 1L).otherwise(0L)),
          lit(0L)).as("n_both_right"),
        coalesce(sum(when(a === 0L && b0 === 0L, 1L).otherwise(0L)),
          lit(0L)).as("n_both_wrong"),
        coalesce(sum(when(a === 1L && b0 === 0L, 1L).otherwise(0L)),
          lit(0L)).as("b"),
        coalesce(sum(when(a === 0L && b0 === 1L, 1L).otherwise(0L)),
          lit(0L)).as("c"))
      .withColumn("chi2",
        when(col("b") + col("c") > 0,
          ((abs(col("b") - col("c")) - 1) *
            (abs(col("b") - col("c")) - 1)).cast("double")
            / (col("b") + col("c")).cast("double")))
  }

  /** SALTED PSEUDONYMIZATION of identifier columns — the export-time
    * governance step between keeping raw identifiers (a linkage risk
    * [[kAnonymity]] measures) and dropping them (which kills grouping):
    * each value maps to sha256(salt ':' value), deterministic WITHIN a
    * release (joins and group-bys still line up) and unlinkable across
    * releases that rotate the salt. Nulls stay null; every column
    * keeps its row. The salt must be managed like a key — with it, a
    * dictionary attack over a small id domain re-identifies (that is
    * the documented limit of pseudonymization vs anonymization).
    * Map-only, codegen'd sha2 — one scan regardless of column count. */
  def pseudonymize(df: DataFrame, cols: Seq[String],
                   salt: String): DataFrame = {
    require(cols.nonEmpty, "need at least one column to pseudonymize")
    require(salt.nonEmpty, "empty salt defeats the rotation story")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"pseudonymize: missing column(s) ${missing.mkString(", ")}")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isNotNull,
        sha2(concat(lit(salt), lit(":"), col(c).cast("string")), 256)))
    }
  }
}
