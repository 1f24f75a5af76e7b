package graft

import org.apache.spark.sql.functions._

import graft.llmops.Robust

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clamps outliers to the group's percentile bounds") {
    // 999 ordinary values + one wild outlier; p99 at index 0.99*999=989.01
    // interpolates between 989 and 990 — the outlier only contributes to
    // ranks above it, so the clamp lands near 990
    val df = ((1 to 999).map(i => ("a", i.toDouble)) :+ (("a", 1e9))).toDF("g", "v")
    val out = Robust.winsorize(df, "g", "v", 0.01, 0.99)
    val mx = out.agg(max("v_w")).as[Double].collect().head
    assert(mx < 1e3, s"outlier not clamped: $mx")
    val mn = out.agg(min("v_w")).as[Double].collect().head
    assert(mn >= 1.0 && mn <= 12.0)                          // p01 ~ 10.99
    assert(out.count() === 1000)                             // no rows dropped
  }

  test("winsorize leaves in-bounds values untouched") {
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
    val out = Robust.winsorize(df, "g", "v", 0.0, 1.0)
    assert(out.filter(col("v") =!= col("v_w")).count() === 0)
  }

  test("histogram bins partition the data and counts sum to the input size") {
    val df = Seq(("a", -7.5), ("a", -0.1), ("a", 0.0), ("a", 4.9), ("a", 5.0), ("b", 12.0))
      .toDF("g", "v")
    val out = Robust.histogram(df, "g", "v", 5.0).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(("a", -2L)) === 1)    // -7.5 -> floor(-1.5) = -2
    assert(out(("a", -1L)) === 1)    // -0.1
    assert(out(("a", 0L)) === 2)     // 0.0, 4.9
    assert(out(("a", 1L)) === 1)     // 5.0 lands in the next bin exactly
    assert(out(("b", 2L)) === 1)
    assert(out.values.sum === 6)
  }
}
