package graft

import org.apache.spark.sql.functions._

import graft.llmops.Whitening

class WhiteningSpec extends SparkSpec {
  import spark.implicits._

  test("whitening a hand-built correlated 2D cloud: cov -> I, means -> 0, eigenvalues descending") {
    // y = 2x + small deterministic wiggle: strongly correlated, so raw
    // covariance is far from diagonal — whitening must fix exactly that
    val pts = (0 until 400).map { i =>
      val x = (i % 20).toDouble
      val y = 2.0 * x + ((i * 7) % 5).toDouble
      (i.toLong, Array(x.toFloat, y.toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val rep = Whitening.whitenReport(df, "embedding", k = 2).collect().head
    assert(rep.getAs[Long]("n") === 400L)
    assert(rep.getAs[Boolean]("mean_zero_ok"))
    assert(rep.getAs[Boolean]("whitened_cov_ok"))
    assert(rep.getAs[Boolean]("ev_monotone_ok"))
  }

  test("transform: k output dims, deterministic across applications, centering is real") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Whitening.fit(df, "embedding", k = 8)
    assert(model.w.length === 8 && model.w.head.length === 64)
    assert(model.eigenvalues.length === 8)
    val a = Whitening.transform(df, "embedding", "w", model)
      .select(col("vec_id"), col("w")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.values.forall(_.length === 8))
    val b = Whitening.transform(df, "embedding", "w", model)
      .select(col("vec_id"), col("w")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a === b, "same model + same rows must whiten identically")
    // the mean vector really is subtracted: whitening the mean itself
    // (as a 1-row frame, kept in doubles — a float32 roundtrip of the
    // mean would leave a 1/sqrt(lambda)-amplified residual) lands at
    // the origin
    val mu = Seq((0L, model.mean)).toDF("vec_id", "embedding")
    val z = Whitening.transform(mu, "embedding", "w", model)
      .select(col("w")).collect().head.getSeq[Double](0)
    assert(z.forall(v => math.abs(v) < 1e-9))
  }
}
