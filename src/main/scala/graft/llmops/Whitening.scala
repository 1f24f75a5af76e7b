package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA whitening for embedding columns — the standard preprocessing
  * before ANN indexing / clustering when raw embedding dimensions are
  * correlated and unevenly scaled (it equalizes them, making cosine and
  * L2 neighborhoods better conditioned; OPQ/IVF training conventionally
  * starts from whitened vectors).
  *
  * Pipeline: column means + covariance via
  * `mllib.linalg.distributed.RowMatrix` (a treeAggregate of one dense
  * d×d accumulator per partition — d=64 is 32 KB of state, so this
  * scales with partition count, never row count), eigendecomposition of
  * the d×d covariance DRIVER-side (breeze, bundled with Spark; a 64×64
  * symmetric eig is microseconds), then the k×d whitening matrix
  * `W = diag(1/√λ)·Vᵀ` rides into the plan as ARRAY LITERALS and the
  * projection `w = W·(x−μ)` is a shared centering + one higher-order
  * dot product per output dimension — no shuffle, no UDF, map-only
  * (see [[transform]] for why HOF rather than the q149 unrolled form).
  *
  * Cross-engine contract: eigenvectors carry sign/rotation freedom no
  * oracle can pin, so the registered query ships VERDICT columns (the
  * q28/q41 approximate-operator pattern): the whitened sample
  * covariance must be I_k within tolerance, the whitened means zero,
  * and the eigenvalue sequence monotone — claims any correct
  * implementation satisfies and DuckDB can predict as `true`.
  */
object Whitening {

  /** Fitted whitening model: column means, eigenvalues (descending),
    * and the k×d whitening matrix rows.
    */
  final case class WhitenModel(mean: Array[Double], eigenvalues: Array[Double],
      w: Array[Array[Double]])

  /** Fit the PCA-whitening model: TWO distributed passes total (column
    * stats for the mean, then the covariance treeAggregate) and a
    * driver-side breeze `eigSym` of the d×d matrix — deliberately NOT
    * MLlib's `computePrincipalComponents`, which recomputes the
    * covariance internally and would make it three data passes; the
    * direct eig also yields the eigenvalues themselves instead of
    * fractions-of-trace. `eps` regularizes near-zero eigenvalues (a
    * rank-deficient direction would otherwise blow up the scale).
    */
  def fit(df: DataFrame, vecCol: String, k: Int, eps: Double = 1e-12): WhitenModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rows = df.select(Similarity.asDouble(col(vecCol)).as("v"))
      .rdd.map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
    val mat = new RowMatrix(rows)
    val d = mat.numCols().toInt
    require(k <= d, s"k=$k exceeds embedding dimension $d")
    val mean = mat.computeColumnSummaryStatistics().mean.toArray
    val cov = mat.computeCovariance()
    // both mllib and breeze store column-major; symmetric anyway
    val es = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix[Double](d, d, cov.toArray))
    // eigSym returns ascending eigenvalues; take the top k, descending,
    // index tie-break for a total (deterministic) order
    val topIdx = (0 until d).sortBy(i => (-es.eigenvalues(i), i)).take(k)
    val lambda = topIdx.map(es.eigenvalues(_)).toArray
    val w = Array.tabulate(k, d) { (i, j) =>
      es.eigenvectors(j, topIdx(i)) / math.sqrt(lambda(i) + eps)
    }
    WhitenModel(mean, lambda, w)
  }

  /** Apply a fitted model: adds `outCol` = W·(x−μ) as array<double>.
    * The k×d matrix and the mean ride as ARRAY LITERALS and the
    * projection is `transform(W, row → Σ row·centered)` — deliberately
    * the higher-order form, not k unrolled d-term sums: at k·d = 1024
    * the unrolled expression tree exceeds janino's 64 KB method limit
    * and Spark falls back anyway (measured), while the HOF form
    * evaluates the same flops without the codegen cliff. The centering
    * is shared across all k output dimensions.
    */
  def transform(df: DataFrame, vecCol: String, outCol: String,
      model: WhitenModel): DataFrame = {
    val v = Similarity.asDouble(col(vecCol))
    val muLit = array(model.mean.map(lit).toSeq: _*)
    val wLit = array(model.w.map(row => array(row.map(lit).toSeq: _*)).toSeq: _*)
    val centered = zip_with(v, muLit, (x, m) => x - m)
    df.withColumn(outCol,
      org.apache.spark.sql.functions.transform(wLit, row =>
        aggregate(zip_with(row, centered, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)))
  }

  /** Fit + transform + SELF-CHECK, one row of verdicts (the registered
    * q162 shape): the whitened sample covariance must equal I_k and the
    * whitened means zero within `tol`, and the eigenvalues must be
    * positive and descending. The checks re-run the same distributed
    * covariance pass over the whitened output — nothing is collected
    * beyond the two d-bounded matrices.
    */
  def whitenReport(df: DataFrame, vecCol: String, k: Int,
      tol: Double = 1e-6): DataFrame = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val spark = df.sparkSession
    val model = fit(df, vecCol, k)
    val whitened = transform(df, vecCol, "__w", model)
    val wRows = whitened.select(col("__w"))
      .rdd.map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
    val wMat = new RowMatrix(wRows)
    val n = wMat.numRows()
    val wMean = wMat.computeColumnSummaryStatistics().mean.toArray
    val wCov = wMat.computeCovariance()
    val covErr = (for { i <- 0 until k; j <- 0 until k } yield
      math.abs(wCov(i, j) - (if (i == j) 1.0 else 0.0))).max
    val meanErr = wMean.map(math.abs).max
    val evMonotone = model.eigenvalues.sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true
    } && model.eigenvalues.forall(_ > 0)
    import spark.implicits._
    Seq((n, k, meanErr < tol, covErr < tol, evMonotone))
      .toDF("n", "k", "mean_zero_ok", "whitened_cov_ok", "ev_monotone_ok")
  }
}
