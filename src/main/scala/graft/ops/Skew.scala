package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB posture (SURVEY.md §4 +
  * builder prompt: "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles sort-merge cases automatically; these helpers
  * cover the two places AQE can't: hot-key aggregation fan-in and
  * broadcast-infeasible joins against a skewed build side. Salts are
  * deterministic (hash of a discriminator column), never `rand()` — plans
  * stay replayable and speculative tasks stay consistent.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a discriminator column. */
  def saltOf(discriminator: Column, buckets: Int): Column =
    pmod(xxhash64(discriminator), lit(buckets)).cast("int")

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt), then
    * final-aggregate on keys. Decomposable aggregates only — pass the
    * partial and the matching final combiner.
    *
    * Example — skew-proof count:
    * {{{
    * Skew.twoPhaseAgg(df, Seq("k"), col("id"), 64,
    *   partial = count(lit(1)), finalAgg = sum(col("_partial")))
    * }}}
    */
  def twoPhaseAgg(df: DataFrame, keyCols: Seq[String],
                  discriminator: Column, buckets: Int,
                  partial: Column, finalAgg: Column): DataFrame =
    df.withColumn("_salt", saltOf(discriminator, buckets))
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(partial.as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(finalAgg.as("agg"))

  /** Salted equi-join for a skewed left side against a non-broadcastable
    * right side: the left gets a deterministic salt, the right is
    * replicated `buckets` times, and the join key becomes
    * (keys..., salt) — hot keys spread over `buckets` reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 discriminator: Column, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("_salt", saltOf(discriminator, buckets))
    // MEASURED AND REVERTED (r18): hint("shuffle_hash") on the
    // replicated side — AQE otherwise collects buckets x |right| rows
    // into a single-threaded DRIVER-built broadcast relation, and the
    // shuffled-hash join measured 2x faster at sf0.1 (2.17 -> 1.05 s
    // noop A/B). Reverted because the different partial-sum ORDER
    // flipped q84's round(sum(double), 4) by one ulp against the
    // DuckDB oracle at sf0.1 (fine at sf0.01) — a float-rounding
    // boundary, not a logic change, but the verified result set is the
    // contract. At real scale the hint is moot anyway: the replicated
    // side exceeds any broadcast threshold and shuffles regardless.
    val r = right
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }
}
