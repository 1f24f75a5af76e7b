package graft

import graft.llmops.Embeddings

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def sr6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6

  test("classSeparation: separated clusters score high, a planted stray is misassigned") {
    val vecs = Seq(
      (1L, 0, Array(0.0f, 0.0f)), (2L, 0, Array(1.0f, 0.0f)),
      (3L, 0, Array(0.0f, 1.0f)),
      (4L, 1, Array(10.0f, 10.0f)), (5L, 1, Array(11.0f, 10.0f)),
      (6L, 1, Array(10.0f, 11.0f)),
      (7L, 0, Array(10.5f, 10.5f)) // stray: labeled 0, sits in cluster 1
    ).toDF("vec_id", "label", "embedding")
    val out = Embeddings.classSeparation(vecs, "embedding", "label")
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    assert(out(0).getAs[Long]("n") === 4L && out(1).getAs[Long]("n") === 3L)
    assert(out(1).getAs[Long]("n_misassigned") === 0L)
    assert(out(0).getAs[Long]("n_misassigned") === 1L) // the stray
    assert(out(1).getAs[Double]("silhouette") > 0.8)   // tight, far cluster
    assert(out(0).getAs[Double]("silhouette") < out(1).getAs[Double]("silhouette"))
  }

  test("classSeparation: non-integer label columns work (generic read, r11 advice)") {
    // same geometry as the misassignment test, labels as STRINGS — the
    // previous getInt(0) threw a raw ClassCastException here
    val vecs = Seq(
      (1L, "lo", Array(0.0f, 0.0f)), (2L, "lo", Array(1.0f, 0.0f)),
      (3L, "lo", Array(0.0f, 1.0f)),
      (4L, "hi", Array(10.0f, 10.0f)), (5L, "hi", Array(11.0f, 10.0f)),
      (6L, "hi", Array(10.0f, 11.0f)),
      (7L, "lo", Array(10.5f, 10.5f))
    ).toDF("vec_id", "label", "embedding")
    val out = Embeddings.classSeparation(vecs, "embedding", "label")
      .collect().map(r => r.getAs[String]("label") -> r).toMap
    assert(out.keySet === Set("lo", "hi"))
    assert(out("lo").getAs[Long]("n_misassigned") === 1L)
    assert(out("hi").getAs[Long]("n_misassigned") === 0L)
  }

  test("classSeparation: scalar replication of one silhouette value") {
    // label 0 centroid = (0.5, 0); label 1 centroid = (4, 0) exactly
    val vecs = Seq(
      (1L, 0, Array(0.0f, 0.0f)), (2L, 0, Array(1.0f, 0.0f)),
      (3L, 1, Array(4.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val out = Embeddings.classSeparation(vecs, "embedding", "label")
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    // vec 1: a = 0.5, b = 4 -> s = 3.5/4; vec 2: a = 0.5, b = 3 -> 2.5/3
    val exp0 = (3.5 / 4.0 + 2.5 / 3.0) / 2.0
    assert(math.abs(out(0).getAs[Double]("silhouette") - sr6(exp0)) < 1e-9)
    // vec 3 IS its centroid: a = 0, b = 3.5 -> s = 1
    assert(out(1).getAs[Double]("silhouette") === 1.0)
  }
}
