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

  test("performanceSummary: hand-computed tear sheet, drawdown from the running max") {
    // closes 100 -> 110 -> 99 -> 108.9: rets +0.10, -0.10, +0.10
    // running max 100, 110, 110, 110 -> dd 0, 0, -0.1, -0.01
    val df = Seq(("A", 0L, 100.0), ("A", 1L, 110.0), ("A", 2L, 99.0), ("A", 3L, 108.9))
      .toDF("sym", "seq", "close")
    val out = Risk.performanceSummary(df, "close", Seq("sym"), Seq("seq"),
      periodsPerYear = 4.0).collect().head
    assert(out.getAs[Long]("n_periods") === 4L)
    assert(out.getAs[Long]("n_rets") === 3L)
    val mu = (0.10 - 0.10 + (108.9 / 99.0 - 1.0)) / 3.0
    assert(math.abs(out.getAs[Double]("ann_ret") - mu * 4.0) < 1e-6)
    val sd = math.sqrt(((0.10 - mu) * (0.10 - mu) + (-0.10 - mu) * (-0.10 - mu)
      + ((108.9 / 99.0 - 1.0) - mu) * ((108.9 / 99.0 - 1.0) - mu)) / 2.0)
    assert(math.abs(out.getAs[Double]("ann_vol") - sd * 2.0) < 1e-6)
    assert(math.abs(out.getAs[Double]("sharpe") - mu * 4.0 / (sd * 2.0)) < 1e-6)
    // downside: only the -0.10 return
    val dn = math.sqrt(0.01 / 2.0)
    assert(math.abs(out.getAs[Double]("sortino") - mu * 4.0 / (dn * 2.0)) < 1e-6)
    assert(out.getAs[Double]("max_drawdown") === -0.1)
    assert(math.abs(out.getAs[Double]("calmar") - mu * 4.0 / 0.1) < 1e-6)
  }

  test("performanceSummary edge cases: single row, all-gains sortino, zero close guard") {
    val df = Seq(
      ("ONE", 0L, 50.0),                      // single period: everything null
      ("UP", 0L, 10.0), ("UP", 1L, 11.0), ("UP", 2L, 12.1),  // no losses
      ("Z", 0L, 0.0), ("Z", 1L, 5.0), ("Z", 2L, 10.0))       // zero first close
      .toDF("sym", "seq", "close")
    val rows = Risk.performanceSummary(df, "close", Seq("sym"), Seq("seq"))
      .collect().map(r => r.getAs[String]("sym") -> r).toMap
    val one = rows("ONE")
    assert(one.getAs[Long]("n_rets") === 0L)
    assert(one.isNullAt(one.fieldIndex("ann_ret")))
    assert(one.isNullAt(one.fieldIndex("ann_vol")))
    assert(one.isNullAt(one.fieldIndex("sharpe")))
    assert(one.isNullAt(one.fieldIndex("calmar"))) // dd = 0, never negative
    val up = rows("UP")
    assert(up.isNullAt(up.fieldIndex("sortino")))  // zero downside
    assert(up.getAs[Double]("max_drawdown") === 0.0)
    val z = rows("Z")
    // return off the zero close is null, not infinite; drawdown guard too
    assert(z.getAs[Long]("n_rets") === 1L)
  }

  test("riskContributions: shares sum to 1 and match the hand-built covariance matrix") {
    // closes -> returns: A (0.10, -0.10, 0.10), B (0.05, 0.05, -0.05), C = 2x A's
    val closes = Map(
      "A" -> Seq(100.0, 110.0, 99.0, 108.9),
      "B" -> Seq(100.0, 105.0, 110.25, 104.7375),
      "C" -> Seq(50.0, 60.0, 48.0, 57.6))
    val rows = closes.toSeq.flatMap { case (k, cs) =>
      cs.zipWithIndex.map { case (c, i) => (k, i.toLong, c) }
    }
    val out = Risk.riskContributions(
      rows.toDF("sym", "t", "close"), "sym", "t", "close")
      .collect().map(r => r.getAs[String]("sym") -> r).toMap
    assert(out.size === 3)
    // hand covariance in the same pico-quantized arithmetic
    val rets = closes.view.mapValues(cs =>
      cs.sliding(2).map(p => p(1) / p(0) - 1.0).toSeq).toMap
    def covS(a: Seq[Double], b: Seq[Double]) = {
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum / (a.length - 1)
    }
    val keys = Seq("A", "B", "C")
    val cp = for (i <- keys; j <- keys)
      yield (i, j) -> math.floor(covS(rets(i), rets(j)) * 1e12 + 0.5).toLong
    val m = cp.toMap
    val tot = m.values.sum
    val varP = (tot.toDouble / 1e12) / 9.0
    keys.foreach { k =>
      val rsum = keys.map(j => m((k, j))).sum
      val r = out(k)
      assert(r.getAs[Long]("n_keys") === 3L)
      assert(r.getAs[Double]("var_p") === varP)
      assert(r.getAs[Double]("risk_share") === rsum.toDouble / tot.toDouble)
      assert(r.getAs[Double]("mcr") === ((rsum.toDouble / 1e12) / 9.0) / math.sqrt(varP))
    }
    assert(math.abs(keys.map(out(_).getAs[Double]("risk_share")).sum - 1.0) < 1e-12)
  }

  test("riskParity: weights are inverse-vol micro-unit ratios; a constant series sits out") {
    // A alternates +-10% (high vol), B +-5% (half), C constant (no book)
    def mk(k: String, up: Double): Seq[(String, Long, Double)] = {
      var px = 100.0
      (0L until 9L).map { i =>
        val r = if (i == 0) (k, i, px)
        else { px = if (i % 2 == 1) px * (1 + up) else px * (1 - up); (k, i, px) }
        r
      }
    }
    val rows = mk("A", 0.10) ++ mk("B", 0.05) ++ (0L until 9L).map(i => ("C", i, 50.0))
    val out = Risk.riskParity(rows.toDF("sym", "t", "close"), "sym", "t", "close")
      .collect().map(r => r.getAs[String]("sym") -> r).toMap
    val c = out("C")
    assert(c.isNullAt(c.fieldIndex("vol")) && c.isNullAt(c.fieldIndex("weight")))
    def sr6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    def volOf(up: Double): Double = {
      val rets = (1 until 9).map(i => if (i % 2 == 1) up else -up)
      val mu = rets.sum / rets.length
      sr6(math.sqrt(rets.map(r => (r - mu) * (r - mu)).sum / (rets.length - 1)))
    }
    val (va, vb) = (volOf(0.10), volOf(0.05))
    val (ia, ib) = (math.floor(1.0 / va * 1e6 + 0.5).toLong, math.floor(1.0 / vb * 1e6 + 0.5).toLong)
    assert(out("A").getAs[Double]("vol") === va)
    assert(out("A").getAs[Double]("weight") === ia.toDouble / (ia + ib).toDouble)
    assert(out("B").getAs[Double]("weight") === ib.toDouble / (ia + ib).toDouble)
    // lower vol -> bigger weight; weights of the book sum to 1
    assert(out("B").getAs[Double]("weight") > out("A").getAs[Double]("weight"))
    assert(math.abs(out("A").getAs[Double]("weight") + out("B").getAs[Double]("weight") - 1.0) < 1e-12)
    assert(out("A").getAs[Double]("port_vol") > 0.0)
  }

  test("bootstrapSharpe: hash-derived draws are reproducible; CI brackets a stable Sharpe") {
    // 23 returns -> 4 complete 5-blocks (trailing partial dropped)
    val rets = Seq(0.012, -0.004, 0.009, 0.015, -0.007, 0.011, 0.002, -0.009,
      0.013, 0.006, -0.002, 0.010, 0.004, -0.006, 0.014, 0.001, 0.008,
      -0.003, 0.007, 0.012, -0.001, 0.005, 0.009)
    val df = rets.zipWithIndex.map { case (r, i) => (i.toLong, r) }.toDF("t", "r")
    val run1 = Risk.bootstrapSharpe(df, "r", "t", blockLen = 5, nResamples = 50)
      .collect().head
    val run2 = Risk.bootstrapSharpe(df, "r", "t", blockLen = 5, nResamples = 50)
      .collect().head
    assert(run1 === run2) // pure function of the data: no seed state
    assert(run1.getAs[Long]("n_days") === 20L)  // 4 complete blocks
    assert(run1.getAs[Long]("n_blocks") === 4L)
    assert(run1.getAs[Long]("b_resamples") === 50L)
    val (lo, hi) = (run1.getAs[Double]("ci_lo"), run1.getAs[Double]("ci_hi"))
    assert(lo < hi)
    // the point estimate from the same 20 rows
    val used = rets.take(20)
    val mu = used.sum / used.length
    val sd = math.sqrt(used.map(r => (r - mu) * (r - mu)).sum / (used.length - 1))
    assert(math.abs(run1.getAs[Double]("sharpe") - math.floor(mu / sd * 1e6 + 0.5) / 1e6) < 1e-9)
    // a constant series has no Sharpe
    val flat = (0 until 15).map(i => (i.toLong, 0.01)).toDF("t", "r")
    val f = Risk.bootstrapSharpe(flat, "r", "t", blockLen = 5, nResamples = 20)
      .collect().head
    assert(f.isNullAt(f.fieldIndex("sharpe")))
  }

  test("bootstrapSharpe: input shorter than one block yields zero resamples, not spurious draws") {
    // n_blocks = 0 -> sequence(1, 0) would be the DESCENDING [1, 0] and
    // fabricate draw rows (r11 advice); the guard empties the grid
    val tiny = Seq((0L, 0.01), (1L, -0.02), (2L, 0.015)).toDF("t", "r")
    val out = Risk.bootstrapSharpe(tiny, "r", "t", blockLen = 5, nResamples = 20)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_blocks") === 0L)
    assert(r.getAs[Long]("b_resamples") === 0L)
    assert(r.isNullAt(r.fieldIndex("sharpe")))
    assert(r.isNullAt(r.fieldIndex("ci_lo")) && r.isNullAt(r.fieldIndex("ci_hi")))
  }

  test("blocked riskContributions equals independent per-block runs; unblocked keys excluded") {
    val paths = Map(
      "A" -> Seq(100.0, 103.0, 99.0, 104.0, 108.0, 102.0),
      "B" -> Seq(201.0, 207.0, 199.0, 209.0, 217.0, 205.0),
      "C" -> Seq(50.0, 48.0, 53.0, 47.0, 52.0, 55.0),
      "D" -> Seq(75.0, 77.0, 74.0, 78.0, 73.0, 79.0),
      "E" -> Seq(10.0, 11.0, 10.5, 11.5, 12.0, 11.0))
    def frame(keys: Set[String]) = paths.toSeq
      .filter(p => keys.contains(p._1))
      .flatMap { case (k, cs) => cs.zipWithIndex.map { case (c, i) => (k, i.toLong, c) } }
      .toDF("sym", "t", "close")
    val sectors = Seq(("A", 0), ("B", 0), ("C", 1), ("D", 1)).toDF("sym", "blk")
    val blocked = Risk.riskContributions(
      frame(paths.keySet), "sym", "t", "close", Some(sectors))
      .collect().map(r => (r.getAs[Int]("pair_block"), r.getAs[String]("sym")) -> r.toSeq.drop(1)).toMap
    assert(blocked.keySet ===
      Set((0, "A"), (0, "B"), (1, "C"), (1, "D"))) // E excluded by contract
    // each block must reproduce a standalone decomposition of its keys
    Seq(0 -> Set("A", "B"), 1 -> Set("C", "D")).foreach { case (blk, keys) =>
      val solo = Risk.riskContributions(frame(keys), "sym", "t", "close")
        .collect().map(r => r.getAs[String]("sym") -> r.toSeq).toMap
      keys.foreach { k =>
        assert(blocked((blk, k)) === solo(k),
          s"block $blk key $k diverges from the standalone run")
      }
    }
  }

  test("riskContributions: a key in two blocks fails loudly, not silently (r12 advice)") {
    val rows = for (k <- Seq("A", "B"); i <- 0 until 5)
      yield (k, i.toLong, 10.0 + i * (if (k == "A") 1.0 else 2.0))
    val dup = Seq(("A", 0), ("A", 1), ("B", 0)).toDF("sym", "blk")
    val e = intercept[Exception] {
      Risk.riskContributions(
        rows.toDF("sym", "t", "close"), "sym", "t", "close", Some(dup)).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("riskContributions blocks frame"),
      s"expected the named uniqueness error, got: $chain")
  }

  test("riskContributions: a flat universe yields zero variance and null attributions") {
    val rows = for (k <- Seq("A", "B"); i <- 0 until 4) yield (k, i.toLong, 10.0)
    val out = Risk.riskContributions(
      rows.toDF("sym", "t", "close"), "sym", "t", "close").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Double]("var_p") === 0.0)
      assert(r.isNullAt(r.fieldIndex("mcr")))
      assert(r.isNullAt(r.fieldIndex("risk_share")))
    }
  }
}
