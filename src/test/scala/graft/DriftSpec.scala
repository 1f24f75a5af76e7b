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

  test("ksTwoSample: hand-computed supremum gap; identical samples zero; one-sample keys absent") {
    // ref {1,2,3,4} vs cur {3,4,5,6}: D = 0.5 (at v=2..4); crit at
    // n=4,4 is c*sqrt(8/16) ~ 0.96 -> not drifted
    val rows = (Seq(1, 2, 3, 4).map(v => ("A", v.toDouble, false)) ++
      Seq(3, 4, 5, 6).map(v => ("A", v.toDouble, true)) ++
      Seq(1, 2).map(v => ("REFONLY", v.toDouble, false)))
      .toDF("k", "v", "cur")
    val out = Drift.ksTwoSample(rows, "k", "v", col("cur")).collect()
    assert(out.map(_.getString(0)).toSet === Set("A")) // one-sample key absent
    val a = out.head
    assert(a.getAs[Long]("n_ref") === 4L && a.getAs[Long]("n_cur") === 4L)
    assert(a.getAs[Double]("ks_d") === 0.5)
    val expCrit = Drift.ksCriticalC(0.05) * math.sqrt(8.0 / 16.0)
    assert(math.abs(a.getAs[Double]("crit") - expCrit) < 1e-6)
    assert(!a.getAs[Boolean]("drifted"))

    // identical samples: every ECDF gap is zero, including at ties
    val same = (Seq(1, 1, 2).map(v => ("B", v.toDouble, false)) ++
      Seq(1, 1, 2).map(v => ("B", v.toDouble, true))).toDF("k", "v", "cur")
    val b = Drift.ksTwoSample(same, "k", "v", col("cur")).collect().head
    assert(b.getAs[Double]("ks_d") === 0.0 && !b.getAs[Boolean]("drifted"))

    // disjoint supports: D = 1, always drifted at these sizes
    val dis = (Seq(1, 2, 3, 4, 5).map(v => ("C", v.toDouble, false)) ++
      Seq(11, 12, 13, 14, 15).map(v => ("C", v.toDouble, true))).toDF("k", "v", "cur")
    val c = Drift.ksTwoSample(dis, "k", "v", col("cur")).collect().head
    assert(c.getAs[Double]("ks_d") === 1.0 && c.getAs[Boolean]("drifted"))
  }
}
