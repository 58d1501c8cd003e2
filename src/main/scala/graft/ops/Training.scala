package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-run telemetry analytics — the feedback half of a data
  * pipeline: a 100 TB corpus is curated BEFORE training, but the
  * per-example loss telemetry a run emits (doc id, step, loss) is what
  * tells the curator which strata were worth it. These operators turn
  * that telemetry back into data-quality verdicts.
  *
  * Float discipline: losses arrive as INTEGER milli-units (the caller
  * quantizes once at ingest — telemetry is logged at fixed precision
  * anyway), every per-doc reduction is exact integer arithmetic, and
  * each emitted statistic is ONE division at the edge (the portable-
  * quotient convention), so results are bit-stable across engines and
  * partitionings.
  */
object Training {

  /** PER-DOC LOSS-TRAJECTORY AUDIT: ordinary-least-squares slope of
    * loss over step for every document, plus the interpretable
    * endpoints, classified into the verdicts a curation loop acts on
    * (Mindermann et al. 2022 "RHO-loss" reasoning; memorization flags
    * per Carlini et al. 2022):
    *
    *  - `learned`    — slope ≤ -`slopeMilli` (loss falling: the model
    *    is extracting signal; keep this stratum),
    *  - `memorized`  — falling AND the last loss is under
    *    `memorizedLastMilli` (the model has the example by heart;
    *    near-dup suspect, audit its cluster),
    *  - `noisy`      — flat slope but a loss RANGE over
    *    `noisyRangeMilli` (the optimizer can't fit it: label noise /
    *    garbage text suspect),
    *  - `stagnant`   — flat and narrow (contributes nothing; a
    *    down-weighting candidate).
    *
    * OLS over per-doc (step x, loss_milli y):
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — every sum a LONG, the
    * quotient the only division (milli-units per step). Docs with one
    * observation have no slope and are dropped (documented; a 1-point
    * trajectory is unclassifiable).
    *
    * Scale shape: one map-side-combined aggregation keyed by the doc
    * id — six LONG sums as the state, no window, no sort, no second
    * pass; telemetry joins back to the corpus by id only when the
    * caller asks. Input columns: `idCol`, `stepCol` (integral),
    * `lossMilliCol` (integral milli-loss). */
  def lossTrajectories(telemetry: DataFrame, idCol: String = "doc_id",
                       stepCol: String = "step",
                       lossMilliCol: String = "loss_milli",
                       slopeMilli: Double = 10.0,
                       memorizedLastMilli: Long = 100L,
                       noisyRangeMilli: Long = 500L): DataFrame =
    classifyFromState(lossStateSums(telemetry, idCol, stepCol,
        lossMilliCol), idCol,
      slopeMilli, memorizedLastMilli, noisyRangeMilli)

  /** [[lossTrajectories]]' per-doc SUFFICIENT STATISTICS — the twelve
    * columns that make the audit incrementally foldable: the six OLS
    * LONG sums plus the (step, loss) endpoints carried WITH their
    * steps, so two partial states merge by summing the sums,
    * min/max-ing the extremes, and arg-min/arg-maxing the endpoints
    * over their steps ([[mergeLossStates]]). Steps are unique per doc
    * across the whole telemetry stream by contract (a training run
    * logs each (doc, step) once). */
  def lossStateSums(telemetry: DataFrame, idCol: String = "doc_id",
                    stepCol: String = "step",
                    lossMilliCol: String = "loss_milli"): DataFrame = {
    val x = col(stepCol).cast("long")
    val y = col(lossMilliCol).cast("long")
    telemetry
      .filter(col(idCol).isNotNull && x.isNotNull && y.isNotNull)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_steps"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"),
        min(y).as("min_y"), max(y).as("max_y"),
        min(x).as("first_step"), min_by(y, x).as("first_milli"),
        max(x).as("last_step"), max_by(y, x).as("last_milli"))
  }

  /** Fold any number of [[lossStateSums]] partial states (e.g. one per
    * micro-batch) into one state per doc: sums add, extremes min/max,
    * endpoints resolve by their carried steps. One map-side-combined
    * aggregation; exact at any fold order (integer arithmetic only). */
  def mergeLossStates(states: DataFrame,
                      idCol: String = "doc_id"): DataFrame =
    states.groupBy(col(idCol))
      .agg(sum("n_steps").as("n_steps"),
        sum("sx").as("sx"), sum("sy").as("sy"),
        sum("sxx").as("sxx"), sum("sxy").as("sxy"),
        min("min_y").as("min_y"), max("max_y").as("max_y"),
        min("first_step").as("first_step"),
        min_by(col("first_milli"), col("first_step"))
          .as("first_milli"),
        max("last_step").as("last_step"),
        max_by(col("last_milli"), col("last_step")).as("last_milli"))

  /** The classification tail of [[lossTrajectories]] over a (merged)
    * state: slope = the one edge division over the exact sums, then
    * the documented verdict ladder. */
  def classifyFromState(state: DataFrame, idCol: String = "doc_id",
                        slopeMilli: Double = 10.0,
                        memorizedLastMilli: Long = 100L,
                        noisyRangeMilli: Long = 500L): DataFrame = {
    require(slopeMilli >= 0 && noisyRangeMilli >= 0,
      "thresholds must be non-negative")
    val g = state.filter(col("n_steps") >= 2)
    val slope = ((col("n_steps") * col("sxy") -
        col("sx") * col("sy")).cast("double") /
      (col("n_steps") * col("sxx") -
        col("sx") * col("sx")).cast("double"))
    val falling = slope <= -slopeMilli
    val cls = when(falling && col("last_milli") < memorizedLastMilli,
        "memorized")
      .when(falling, "learned")
      .when(col("max_y") - col("min_y") > noisyRangeMilli, "noisy")
      .otherwise("stagnant")
    g.select(col(idCol), col("n_steps"),
      col("first_milli"), col("last_milli"),
      slope.as("slope_milli"), cls.as("verdict"))
  }

  /** The corpus-level rollup of [[lossTrajectories]] a mixture planner
    * reads: per (`groupCol`, verdict), doc counts and the exact-quotient
    * mean last loss — which sources the run is learning from, which it
    * has memorized, which feed it noise. Same exact-integer state, one
    * more map-side-combined aggregation over the |groups·verdicts|-row
    * domain. `byCol` joins group labels onto the telemetry ids
    * (broadcast — the label table is id→group, supplied by the caller
    * corpus-sized: pass it pre-projected to the two columns). */
  def lossVerdictRollup(trajectories: DataFrame, labels: DataFrame,
                        idCol: String = "doc_id",
                        groupCol: String = "source"): DataFrame =
    trajectories
      .join(labels.select(col(idCol), col(groupCol)), Seq(idCol))
      .groupBy(col(groupCol), col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        sum("last_milli").as("sum_last_milli"))
      .select(col(groupCol), col("verdict"), col("n_docs"),
        (col("sum_last_milli").cast("double") /
          col("n_docs").cast("double")).as("mean_last_milli"))
}
