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
    // pin the SHUFFLE join salting exists for: without the hint, AQE
    // sees the replicated right side as broadcastable at bench scale
    // and collects buckets x |right| rows into a DRIVER-built hash
    // relation — self-defeating (a right side small enough to
    // broadcast would be broadcast UNREPLICATED with no salt at all),
    // and measured 2x slower than the shuffled-hash join at sf0.1
    // (driver build is single-threaded; the per-partition builds are
    // not). At scale the hint changes nothing — the replicated side
    // exceeds any broadcast threshold and shuffles anyway.
    val r = right
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
      .hint("shuffle_hash")
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }
}
