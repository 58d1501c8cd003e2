package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** PCA / whitening over an embedding column — the linear-algebra leg of
  * the embedding family (SemDeDup-style near-dup and ANN quality both
  * improve on decorrelated vectors; ABTT / all-but-the-top removes the
  * dominant components the same way).
  *
  * Scale shape: the ONLY corpus-sized pass is one map-side-combined
  * co-moment aggregation ([[Pca.CoMomentAgg]] — count, per-dim sums,
  * upper-triangle Σ xᵢxⱼ; a single buffer of dim(dim+3)/2 doubles per
  * task). The eigendecomposition runs DRIVER-side on the dim×dim
  * covariance matrix (dim is an operator constant — 64 here, ≤ a few
  * thousand in practice; the collect is ONE row of ~dim²/2 doubles,
  * bounded by construction). Projection / whitening is a map-only
  * broadcast-matrix kernel ([[graft.functions.MatVecProject]]) — the
  * corpus never shuffles at any stage.
  */
object Pca {

  /** Co-moment buffer: row count, per-dim sums, and the upper triangle
    * of Σ xᵢxⱼ in row-major band order (entry (i, j ≥ i) lives at
    * i·dim − i(i−1)/2 + (j − i)). */
  case class CoMoments(n: Long, s: Array[Double], p: Array[Double])

  /** One-pass co-moment aggregator over ARRAY<DOUBLE> vectors (cast the
    * float column upstream — float→double is exact). Vectors must be
    * exactly `dim` wide and null-element-free; a ragged vector fails
    * descriptively rather than silently skewing the matrix. */
  class CoMomentAgg(dim: Int)
      extends Aggregator[Seq[Double], CoMoments, CoMoments] {
    private val tri = dim * (dim + 1) / 2
    override def zero: CoMoments =
      CoMoments(0L, new Array[Double](dim), new Array[Double](tri))
    override def reduce(b: CoMoments, v: Seq[Double]): CoMoments = {
      require(v != null && v.length == dim,
        s"expected a $dim-dim vector, got " +
          (if (v == null) "null" else s"${v.length}"))
      val arr = v.toArray
      var i = 0
      var t = 0
      while (i < dim) {
        b.s(i) += arr(i)
        var j = i
        while (j < dim) { b.p(t) += arr(i) * arr(j); t += 1; j += 1 }
        i += 1
      }
      CoMoments(b.n + 1, b.s, b.p)
    }
    override def merge(a: CoMoments, b: CoMoments): CoMoments = {
      var i = 0
      while (i < dim) { a.s(i) += b.s(i); i += 1 }
      var t = 0
      while (t < tri) { a.p(t) += b.p(t); t += 1 }
      CoMoments(a.n + b.n, a.s, a.p)
    }
    override def finish(b: CoMoments): CoMoments = b
    override def bufferEncoder: Encoder[CoMoments] =
      ExpressionEncoder[CoMoments]()
    override def outputEncoder: Encoder[CoMoments] =
      ExpressionEncoder[CoMoments]()
  }

  /** The POPULATION covariance matrix of an embedding column as
    * (i, j ≤ i…dim−1, n, cov) rows — upper triangle only (the matrix is
    * symmetric). One corpus pass (the co-moment aggregation above), then
    * the dim(dim+1)/2 entries unfold from the single moment row via a
    * map-side lambda — no shuffle beyond the aggregation's 1-buffer
    * merge. cov = Σxy/n − (Σx/n)(Σy/n), fixed operation order. */
  def covarianceMatrix(embs: DataFrame, dim: Int = 64,
      vecCol: String = "embedding"): DataFrame = {
    val fn = udaf(new CoMomentAgg(dim), ExpressionEncoder[Seq[Double]]())
    val mom = embs.filter(col(vecCol).isNotNull)
      .select(fn(col(vecCol).cast("array<double>")).as("m"))
      .select(col("m.n").as("n"), col("m.s").as("s"), col("m.p").as("p"))
    val entries = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), { j =>
        // i·(i−1) is even, so the double division is exact; cast back
        // to the INT element_at requires
        val t = (i * lit(dim) - (i * (i - lit(1))) / lit(2) + (j - i))
          .cast("int")
        struct(i.as("i"), j.as("j"),
          (element_at(col("p"), t + 1) / col("n") -
            (element_at(col("s"), i + 1) / col("n")) *
              (element_at(col("s"), j + 1) / col("n"))).as("cov"))
      })))
    mom.select(col("n"), explode(entries).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("n"),
        col("e.cov").as("cov"))
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    val d = a.length
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic (fixed sweep order, fixed rotation formulas, no
    * randomness), driver-side, O(dim³) per sweep: exactly right for
    * covariance matrices whose dim is an operator constant. Returns
    * (eigenvalues DESC, eigenvector ROWS aligned to them — row k is the
    * k-th principal axis). Ties sort by original diagonal index. */
  def symmetricEigen(a0: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    require(d > 0 && a0.forall(_.length == d), "matrix must be square")
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < maxSweeps && offDiagNorm(a) > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0.0) {
            // the numerically-stable tangent form (Golub & Van Loan)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val eig = order.map(i => a(i)(i)).toArray
    val rows = order.map(i => Array.tabulate(d)(r => v(r)(i))).toArray
    (eig, rows)
  }

  /** A fitted PCA model: the data mean, eigenvalues DESC, and the top-k
    * principal axes as ROWS (k × dim). */
  case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                      components: Array[Array[Double]])

  /** The shared moments → model tail: mean, the symmetric covariance
    * rebuilt from the upper-triangle band, Jacobi, top-k axes — ONE
    * implementation so the one-pass and incremental paths cannot
    * drift. */
  private def modelFromMoments(n: Long, s: Array[Double],
      p: Array[Double], k: Int, dim: Int): PcaModel = {
    require(n > 1, s"need at least 2 vectors to fit PCA, got $n")
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = p(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val (eig, rows) = symmetricEigen(cov)
    PcaModel(mean, eig.take(k), rows.take(k))
  }

  /** Fit PCA: ONE corpus pass (the co-moment aggregation) collected as
    * ONE row (≈dim²/2 doubles — bounded by the dim constant, the
    * documented driver-side step), covariance built and Jacobi-solved
    * driver-side, top-k axes kept. */
  def fitPca(embs: DataFrame, k: Int, dim: Int = 64,
      vecCol: String = "embedding"): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val m = momentsOf(embs, dim, vecCol).head()
    modelFromMoments(m.getLong(0), m.getSeq[Double](1).toArray,
      m.getSeq[Double](2).toArray, k, dim)
  }

  /** Append one batch's co-moments to a stored moment STATE — PCA's
    * incremental form (the stored-index argument applied to linear
    * algebra): moments are ADDITIVE, so a corpus-wide model refreshes
    * per batch at BATCH-only cost — the corpus is never re-scanned.
    * State is one (batch_id, n, s, p) row per appended batch,
    * |batches| rows total. */
  /** The ONE co-moment row of a frame — (n, s, p), the additive unit
    * both [[appendMoments]] and the streaming moment sink land. */
  def momentsOf(df: DataFrame, dim: Int = 64,
      vecCol: String = "embedding"): DataFrame = {
    val fn = udaf(new CoMomentAgg(dim), ExpressionEncoder[Seq[Double]]())
    df.filter(col(vecCol).isNotNull)
      .select(fn(col(vecCol).cast("array<double>")).as("m"))
      .select(col("m.n").as("n"), col("m.s").as("s"), col("m.p").as("p"))
  }

  def appendMoments(batch: DataFrame, statePath: String,
      batchId: String, dim: Int = 64,
      vecCol: String = "embedding"): Unit =
    momentsOf(batch, dim, vecCol)
      .select(lit(batchId).as("batch_id"), col("n"), col("s"), col("p"))
      .write.mode("append").parquet(statePath)

  /** Fit PCA from a stored moment state: the |batches| one-row moments
    * fold driver-side (bounded by the batch count — each row is
    * ~dim²/2 doubles), then the same covariance + Jacobi path as
    * [[fitPca]]. fitPcaFromMoments(append(b₁) + append(b₂)) equals
    * fitPca(b₁ ∪ b₂) up to float-sum association — spec-gated. */
  def fitPcaFromMoments(spark: org.apache.spark.sql.SparkSession,
      statePath: String, k: Int, dim: Int = 64): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val tri = dim * (dim + 1) / 2
    val rows = spark.read.parquet(statePath)
      .select(col("n"), col("s"), col("p")).collect()
    require(rows.nonEmpty, s"$statePath holds no moment rows")
    var n = 0L
    val s = new Array[Double](dim)
    val p = new Array[Double](tri)
    rows.foreach { r =>
      n += r.getLong(0)
      val rs = r.getSeq[Double](1); val rp = r.getSeq[Double](2)
      require(rs.length == dim && rp.length == tri,
        s"moment row shape mismatch: dim=${rs.length}, tri=${rp.length}")
      var i = 0
      while (i < dim) { s(i) += rs(i); i += 1 }
      i = 0
      while (i < tri) { p(i) += rp(i); i += 1 }
    }
    modelFromMoments(n, s, p, k, dim)
  }

  /** Project embeddings onto a fitted model's top-k axes (map-only: the
    * k×dim matrix rides ONE broadcast through the
    * [[graft.functions.MatVecProject]] kernel; centering folds into a
    * precomputed k-vector offset, R·mean, so the row cost is one
    * mat-vec). `whiten = true` scales each component by 1/√(λ+eps) —
    * the output covariance becomes the identity, which equalizes
    * cosine geometry for SemDeDup/ANN over anisotropic encoders. */
  def pcaProject(spark: org.apache.spark.sql.SparkSession,
      embs: DataFrame, model: PcaModel, whiten: Boolean = false,
      eps: Double = 1e-9, vecCol: String = "embedding",
      outCol: String = "pca"): DataFrame = {
    val rows =
      if (!whiten) model.components
      else model.components.zip(model.eigenvalues).map { case (r, ev) =>
        val w = 1.0 / math.sqrt(math.max(ev, 0.0) + eps)
        r.map(_ * w)
      }
    val offset = rows.map(r =>
      r.zip(model.mean).map { case (a, b) => a * b }.sum)
    val bc = spark.sparkContext.broadcast(rows)
    val proj = graft.functions.VectorExpressions.matVecProject(
      col(vecCol).cast("array<double>"), bc, 1.0)
    val centered = zip_with(proj,
      lit(offset), (a, b) => a - b)
    embs.withColumn(outCol, centered)
  }
}
