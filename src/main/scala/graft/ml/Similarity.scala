package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column (engine
  * extension; `embeddings.parquet` ships `embedding: ARRAY<FLOAT>`).
  *
  * Brute-force cosine top-k is the exactness baseline (one scan, one
  * top-k-per-query aggregation — fine for one query vector at any scale;
  * for query batches it is a broadcast join). The scale path is LSH/IVF
  * bucketing: hyperplane sign-bits (LSH) or k-means-style coarse centroids
  * (IVF) shrink the candidate set by orders of magnitude before exact
  * re-scoring. All vector math is `zip_with`/`aggregate` column
  * expressions — codegen'd, no UDF.
  */
object Similarity {

  /** Dot product of two ARRAY<DOUBLE> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /** Deterministic pseudo-random hyperplane component for plane p, dim i:
    * a fixed-seed hash mapped to [−0.5, 0.5). Reproducible across
    * executors — no RNG state to ship. */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(concat_ws("_", lit("plane"), lit(p), i.cast("string"))),
      lit(1000000L)).cast("double") / 1e6) - 0.5

  /** Random-hyperplane LSH key: one sign bit per plane (SimHash for dense
    * vectors). Vectors with high cosine land in the same bucket with
    * probability (1 − θ/π)^planes. */
  def hyperplaneKey(v: Column, planes: Int = 12): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** Brute-force cosine top-k against one query vector (exactness
    * baseline). `query` must be a literal array column (e.g.
    * `typedLit(vec)`). Single scan + single top-k: no shuffle of the
    * corpus, only of k·partitions candidates. */
  def bruteForceTopK(embs: DataFrame, query: Column, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    embs.select(col(idCol),
        cosine(col(vecCol).cast("array<double>"), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)

  /** LSH-bucketed ANN: score only vectors sharing the query's bucket
    * (multi-probe: optionally also buckets at Hamming distance 1). At
    * 100 TB the bucketed corpus is pre-computed and partitioned by bucket,
    * making a query a partition-pruned scan. */
  def lshTopK(embs: DataFrame, query: Column, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              planes: Int = 12, multiProbe: Boolean = true): DataFrame = {
    val keyed = embs.select(col(idCol),
      col(vecCol).cast("array<double>").as("v"),
      hyperplaneKey(col(vecCol).cast("array<double>"), planes).as("bucket"))
    val qKey = hyperplaneKey(query, planes)
    val probes: Column = if (multiProbe)
      array((qKey +: (0 until planes).map(p => qKey.bitwiseXOR(lit(1L << p)))): _*)
    else array(qKey)
    keyed.filter(array_contains(probes, col("bucket")))
      .select(col(idCol), cosine(col("v"), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs top-k neighbors per vector via LSH buckets (batch ANN):
    * join within bucket, rank per source id. Bucket sizes bound the pair
    * count; `planes` tunes recall vs cost. */
  def allPairsTopK(embs: DataFrame, k: Int, idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   planes: Int = 8): DataFrame = {
    val keyed = embs.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket",
        hyperplaneKey(col("v"), planes))
    val a = keyed.select(col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"))
    val b = keyed.select(col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"))
    val scored = a.join(b, "bucket")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("v_a"), col("v_b")).as("cosine"))
    val w = Window.partitionBy("id_a")
      .orderBy(col("cosine").desc, col("id_b").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
