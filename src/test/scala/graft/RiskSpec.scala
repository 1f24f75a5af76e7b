package graft

import graft.analytics.Risk

class RiskSpec extends SparkSpec {
  import spark.implicits._

  test("historicalVaR: interpolated quantile, tail mean on the raw diffs") {
    // diffs: -10, -5, -1, 1, 2, 3, 4, 5, 6, 20 (10 of them)
    val diffs = Seq(-10.0, -5.0, -1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 20.0)
    val vals = diffs.scanLeft(100.0)(_ + _)
    val df = vals.zipWithIndex.map { case (v, i) => ("A", i.toLong, v) }
      .toDF("sym", "seq", "px")
    val out = Risk.historicalVaR(df, "px", Seq("sym"), Seq("seq"), alpha = 0.05)
      .collect().head
    // q05 of 10 sorted diffs: index 0.45 -> -10 + 0.45*(-5 - -10) = -7.75
    assert(out.getAs[Long]("n") === 10L)
    assert(out.getAs[Double]("var_a") === -7.75)
    assert(out.getAs[Long]("n_tail") === 1L) // only -10 <= -7.75
    assert(out.getAs[Double]("es_a") === -10.0)
  }

  test("historicalVaR: constant series has zero-width tail at the quantile itself") {
    val df = (0 until 8).map(i => ("F", i.toLong, 5.0)).toDF("sym", "seq", "px")
    val out = Risk.historicalVaR(df, "px", Seq("sym"), Seq("seq")).collect().head
    assert(out.getAs[Double]("var_a") === 0.0)
    assert(out.getAs[Long]("n_tail") === 7L) // every zero diff sits AT the quantile
    assert(out.getAs[Double]("es_a") === 0.0)
  }
}
