package graft

import graft.analytics.Backtest

class BacktestSpec extends SparkSpec {
  import spark.implicits._

  test("crossSectionalMomentum: lagged signal ranks, equal-weight legs, exact compounding") {
    // geometric movers: A +10%/day, B +5%, C -5%, D -10% -> momentum
    // ranks are constant, long {A,B} short {C,D} with ntile(2)
    val growth = Map("A" -> 1.10, "B" -> 1.05, "C" -> 0.95, "D" -> 0.90)
    val rows = for {
      (k, g) <- growth.toSeq
      d <- 0 until 5
    } yield (k, f"2024-01-${d + 1}%02d", 100.0 * math.pow(g, d))
    val out = Backtest.crossSectionalMomentum(
      rows.toDF("sym", "day", "close"), "sym", "day", "close",
      lookback = 1, buckets = 2)
      .collect().sortBy(_.getAs[String]("day"))
    // sig needs mom at d-1 which needs a close at d-2: first emitted day index 2
    assert(out.map(_.getAs[String]("day")).toSeq ===
      Seq("2024-01-03", "2024-01-04", "2024-01-05"))
    out.foreach { r =>
      assert(r.getAs[Long]("n_universe") === 4L)
      assert(math.abs(r.getAs[Double]("long_ret") - 0.075) < 1e-9)
      assert(math.abs(r.getAs[Double]("short_ret") - -0.075) < 1e-9)
      assert(math.abs(r.getAs[Double]("ls_ret") - 0.15) < 1e-9)
    }
    // exact micro-unit compounding: 0.15, 0.30, 0.45 with no FP drift
    assert(out.map(_.getAs[Double]("cum_ls")).toSeq === Seq(0.15, 0.30, 0.45))
  }

  test("crossSectionalMomentum: an empty bottom bucket yields a null spread, cum carries") {
    // only 3 names with 5 buckets: ntile assigns 1..3, bucket 5 empty
    val growth = Map("A" -> 1.10, "B" -> 1.00, "C" -> 0.90)
    val rows = for {
      (k, g) <- growth.toSeq
      d <- 0 until 4
    } yield (k, f"2024-01-${d + 1}%02d", 100.0 * math.pow(g, d))
    val out = Backtest.crossSectionalMomentum(
      rows.toDF("sym", "day", "close"), "sym", "day", "close",
      lookback = 1, buckets = 5)
      .collect().sortBy(_.getAs[String]("day"))
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_universe") === 3L)
      assert(math.abs(r.getAs[Double]("long_ret") - 0.10) < 1e-9) // bucket 1 = A
      assert(r.isNullAt(r.fieldIndex("short_ret")))
      assert(r.isNullAt(r.fieldIndex("ls_ret")))
      assert(r.isNullAt(r.fieldIndex("cum_ls"))) // no non-null spread yet
    }
  }

  test("rankInformationCoefficient: a persistent universe has IC exactly 1 at every horizon") {
    // constant per-key growth: momentum ranking == forward-return
    // ranking on every day -> Spearman IC is exactly 1.0 (integer rank
    // arithmetic, no tolerance needed)
    val growth = Map("A" -> 1.08, "B" -> 1.04, "C" -> 0.97, "D" -> 0.92)
    val rows = for ((k, g) <- growth.toSeq; d <- 0 until 12)
      yield (k, f"2024-01-${d + 1}%02d", 100.0 * math.pow(g, d))
    val out = graft.analytics.Backtest.rankInformationCoefficient(
      rows.toDF("sym", "day", "close"), "sym", "day", "close",
      lookback = 2, horizons = Seq(1, 3))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_universe") === 4L)
      assert(r.getAs[Double]("ic") === 1.0, s"IC must be exactly 1: $r")
      assert(r.getAs[Double]("mean_ic") === 1.0)
      // constant ICs across days: sd = 0 -> t null by the guard
      assert(r.isNullAt(r.fieldIndex("t_ic")))
    }
    // horizon 3 has fewer usable days than horizon 1 (lead runs off)
    val byH = out.groupBy(_.getAs[Int]("horizon")).view.mapValues(_.length).toMap
    assert(byH(3) < byH(1))
  }

  test("legTurnover: a stable book has zero churn; a flip shows up as full turnover") {
    // days 0-2: A,B lead; from day 3 C,D's momentum takes over (signal
    // lags one day, so the book flips on day 4's signal = day 3's mom)
    def px(g1: Double, g2: Double, flipAt: Int)(d: Int): Double =
      100.0 * math.pow(g1, math.min(d, flipAt)) * math.pow(g2, math.max(0, d - flipAt))
    val series = Map(
      "A" -> px(1.10, 0.90, 3) _, "B" -> px(1.05, 0.95, 3) _,
      "C" -> px(0.95, 1.05, 3) _, "D" -> px(0.90, 1.10, 3) _)
    val rows = for ((k, f) <- series.toSeq; d <- 0 until 7)
      yield (k, f"2024-01-${d + 1}%02d", f(d))
    val out = graft.analytics.Backtest.legTurnover(
      rows.toDF("sym", "day", "close"), "sym", "day", "close",
      lookback = 1, buckets = 2, leg = 1)
      .collect().sortBy(_.getAs[String]("day"))
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("n_long"),
        r.getAs[Long]("n_stay"), Option(r.get(r.fieldIndex("churn")))))
    // first emitted day: churn null (no prior book)
    assert(out.head._4.isEmpty && out.head._2 === 2L)
    // stable stretch: same members, churn 0; the flip day: churn 1
    val churns = out.tail.map(_._4.get.asInstanceOf[Double])
    assert(churns.contains(1.0), s"expected a full-turnover day: $out")
    assert(churns.count(_ == 0.0) >= 2, s"expected stable days: $out")
  }
}
