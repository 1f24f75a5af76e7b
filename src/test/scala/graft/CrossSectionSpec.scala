package graft

import graft.analytics.CrossSection

class CrossSectionSpec extends SparkSpec {
  import spark.implicits._

  private def sr6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6

  test("standardize: winsorized z matches a scalar replication; rank is the (value, id) total order") {
    val rows = (1 to 10).map(i => ("d1", i.toLong, i.toDouble))
    val out = CrossSection.standardize(
      rows.toDF("day", "id", "v"), "day", "id", "v")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

    // replicate: interpolated p05/p95 of 1..10 are 1.45 / 9.55
    val lo = 1.0 + 0.45 * 1.0
    val hi = 1.0 + 0.95 * 9.0
    val wv = (1 to 10).map(i => math.min(math.max(i.toDouble, lo), hi))
    val mu = wv.sum / wv.size
    val sd = math.sqrt(wv.map(x => (x - mu) * (x - mu)).sum / (wv.size - 1))
    (1 to 10).foreach { i =>
      assert(out(i.toLong).getAs[Double]("z") === sr6((wv(i - 1) - mu) / sd + 0.0),
        s"z at $i")
      assert(out(i.toLong).getAs[Double]("pct_rank") === sr6((i - 1) / 9.0))
    }
    // tails actually clamp: z of 1 equals z of the 1.45 fence, so the
    // extremes are pulled IN relative to an unwinsorized z
    assert(out(1L).getAs[Double]("z") > sr6((1.0 - mu) / sd))
  }

  test("standardize: constant and single-row periods null out z; rank still total") {
    val df = Seq(
      ("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0), // constant: sd 0
      ("s", 9L, 42.0)                                 // single row: sd NaN
    ).toDF("day", "id", "v")
    val out = CrossSection.standardize(df, "day", "id", "v")
      .collect().map(r => (r.getString(0), r.getAs[Long]("id")) -> r).toMap
    Seq(1L, 2L, 3L).foreach { i =>
      assert(out(("c", i)).isNullAt(out(("c", i)).fieldIndex("z")))
    }
    // ties broken by id: ranks remain a deterministic total order
    assert(out(("c", 1L)).getAs[Double]("pct_rank") === 0.0)
    assert(out(("c", 3L)).getAs[Double]("pct_rank") === 1.0)
    assert(out(("s", 9L)).isNullAt(out(("s", 9L)).fieldIndex("z")))
    assert(out(("s", 9L)).getAs[Double]("pct_rank") === 0.0)
  }
}
