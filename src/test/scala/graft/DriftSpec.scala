package graft

import org.apache.spark.sql.functions._

import graft.analytics.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("populationStabilityIndex: hand-computed shift; reference-less keys absent") {
    // ref A: 0,1,2,3 over 2 bins of [0,3] -> counts (2,2); cur A: all 3 -> (0,4)
    // smoothed p=(.5,.5) q=(1/6,5/6) -> PSI = (1/3)ln3 - (1/3)ln(0.6)
    val rows = Seq(
      ("A", 0.0, false), ("A", 1.0, false), ("A", 2.0, false), ("A", 3.0, false),
      ("A", 3.0, true), ("A", 3.0, true), ("A", 3.0, true), ("A", 3.0, true),
      ("B", 1.0, true) // current-only key: nothing to be stable against
    ).toDF("k", "v", "cur")
    val out = Drift.populationStabilityIndex(rows, "k", "v", col("cur"), bins = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size === 1 && out.contains("A"))
    val p0 = 3.0 / 6; val p1 = 3.0 / 6; val q0 = 1.0 / 6; val q1 = 5.0 / 6
    val expected = (p0 - q0) * math.log(p0 / q0) + (p1 - q1) * math.log(p1 / q1)
    assert(out("A").getAs[Double]("psi") ===
      math.floor(expected * 1e6 + 0.5) / 1e6)
    assert(out("A").getAs[Long]("n_ref") === 4L)
    assert(out("A").getAs[Long]("n_cur") === 4L)
  }

  test("populationStabilityIndex: null flags read as reference in BOTH fit and counts; null values excluded") {
    // base: ref 0..3 / cur 4x3.0 (the hand case). Adding null-flag rows
    // must change the FIT and the counts together; null values vanish
    val rows = Seq(
      ("A", Some(0.0), Some(false)), ("A", Some(1.0), Some(false)),
      ("A", Some(2.0), Some(false)), ("A", Some(3.0), Some(false)),
      ("A", Some(3.0), Some(true)), ("A", Some(3.0), Some(true)),
      ("A", Some(3.0), Some(true)), ("A", Some(3.0), Some(true)),
      ("A", Some(2.0), Option.empty[Boolean]),  // null flag -> reference
      ("A", Option.empty[Double], Some(true))   // null value -> excluded
    ).toDF("k", "v", "cur")
    val out = Drift.populationStabilityIndex(rows, "k", "v", col("cur"), bins = 2)
      .collect().head
    assert(out.getAs[Long]("n_ref") === 5L)   // the null-flag row counted as ref
    assert(out.getAs[Long]("n_cur") === 4L)   // the null-value row counted nowhere
    // and the score equals an explicit-false encoding of the same rows
    val explicit = rows.withColumn("cur2", coalesce(col("cur"), lit(false)))
    val twin = Drift.populationStabilityIndex(
      explicit.filter(col("v").isNotNull), "k", "v", col("cur2"), bins = 2)
      .collect().head
    assert(out.getAs[Double]("psi") === twin.getAs[Double]("psi"))
  }

  test("populationStabilityIndex: identical slices score exactly zero; tails clamp") {
    val vals = (0 until 100).map(_.toDouble)
    val rows = (vals.map(("A", _, false)) ++ vals.map(("A", _, true)))
      .toDF("k", "v", "cur")
    val out = Drift.populationStabilityIndex(rows, "k", "v", col("cur"))
      .collect().head
    assert(out.getAs[Double]("psi") === 0.0)
    // current values far outside the reference range land in edge bins,
    // not nowhere: PSI must move, and n_cur must count every row
    val shifted = (vals.map(("A", _, false)) ++ vals.map(v => ("A", v + 1000, true)))
      .toDF("k", "v", "cur")
    val s = Drift.populationStabilityIndex(shifted, "k", "v", col("cur"))
      .collect().head
    assert(s.getAs[Long]("n_cur") === 100L)
    assert(s.getAs[Double]("psi") > 1.0, s.toString) // everything in the top bin
  }
}
