package graft

import org.apache.spark.sql.functions._

import graft.analytics.Indicators

class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Double*): org.apache.spark.sql.DataFrame =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, "A", v) }
      .toDF("seq", "sym", "px")

  test("rsi: all-up series is 100, all-down is 0, flat is 50, first row null") {
    val up = Indicators.rsi(series(1, 2, 3, 4), "px", "rsi", Seq("sym"), Seq("seq"), 14)
      .orderBy("seq").select("rsi").as[Option[Double]].collect()
    assert(up.head.isEmpty)                 // no lag on the first row
    assert(up.tail.forall(_.contains(100.0)))

    val down = Indicators.rsi(series(4, 3, 2, 1), "px", "rsi", Seq("sym"), Seq("seq"), 14)
      .orderBy("seq").select("rsi").as[Option[Double]].collect()
    assert(down.tail.forall(_.contains(0.0)))

    val flat = Indicators.rsi(series(5, 5, 5), "px", "rsi", Seq("sym"), Seq("seq"), 14)
      .orderBy("seq").select("rsi").as[Option[Double]].collect()
    assert(flat.tail.forall(_.contains(50.0)))
  }

  test("rsi: hand-computed mixed series, trailing frame only") {
    // diffs: null, +2, -1, +3  -> at row 3 (frame rows 0..3):
    // gains (2, 0, 3) avg 5/3; losses (0, 1, 0) avg 1/3 -> rsi = 100*5/6
    val out = Indicators.rsi(series(10, 12, 11, 14), "px", "rsi", Seq("sym"), Seq("seq"), 14)
      .orderBy("seq").select("rsi").as[Option[Double]].collect()
    assert(math.abs(out(3).get - 100.0 * 5 / 6) < 1e-5)
  }

  test("maxDrawdown: deepest drop from the running peak, not global min/max") {
    // peak path: 10,10,20,20 ; deepest drawdown is 8/20 - 1 = -0.6
    // (global min 5 against later peak 20 never co-occurs: 5 precedes 20)
    val out = Indicators.maxDrawdown(series(10, 5, 20, 8), "px", Seq("sym"), Seq("seq"))
      .collect().head
    assert(math.abs(out.getAs[Double]("max_drawdown") - (8.0 / 20.0 - 1.0)) < 1e-9)
    assert(out.getAs[Double]("peak") === 20.0)
  }

  test("underwaterSpells: spell opens under a refreshed peak, recovery at the prior peak closes it") {
    // 10, 8, 9, 10, 12, 11, 12, 13: spell under peak 10 lasts 2 rows
    // (depth -0.2), recovery at the tie; spell under peak 12 lasts 1 row
    val out = Indicators.underwaterSpells(
      series(10, 8, 9, 10, 12, 11, 12, 13), "px", Seq("sym"), Seq("seq"))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_spells") === 2)
    assert(out.head.getAs[Long]("max_underwater") === 2)
    assert(out.head.getAs[Double]("max_drawdown") === -0.2)
  }

  test("underwaterSpells: monotone series never goes underwater") {
    val out = Indicators.underwaterSpells(
      series(1, 2, 3, 4), "px", Seq("sym"), Seq("seq")).collect()
    assert(out.head.getAs[Long]("n_spells") === 0)
    assert(out.head.getAs[Long]("max_underwater") === 0)
    assert(out.head.getAs[Double]("max_drawdown") === 0.0)
  }

  test("rollingMedian: outlier-immune lower median, series head uses available rows") {
    val out = Indicators.rollingMedian(
        series(1, 100, 2, 3), "px", "med", Seq("sym"), Seq("seq"), 3)
      .orderBy("seq").select("med").as[Double].collect()
    // frames: [1] -> 1; [1,100] -> lower median 1; [1,100,2] -> 2; [100,2,3] -> 3
    assert(out.toSeq === Seq(1.0, 1.0, 2.0, 3.0))
  }

  test("fracDiff: binomial weights exact for dyadic d; constant series scales by the weight sum") {
    // d=0.5, window=4: w = 1, -1/2, -1/8, -1/16 (all dyadic -> exact)
    assert(graft.analytics.Indicators.fracDiffWeights(0.5, 4) ===
      Seq(1.0, -0.5, -0.125, -0.0625))
    val out = graft.analytics.Indicators.fracDiff(
        series(8, 8, 8, 8, 8, 8), "px", "fd", Seq("sym"), Seq("seq"),
        d = 0.5, window = 4)
      .orderBy("seq").select("fd").collect()
    // incomplete windows (first 3 rows) are null — fixed-window contract
    assert((0 until 3).forall(out(_).isNullAt(0)))
    // full windows: 8 * (1 - 1/2 - 1/8 - 1/16) = 8 * 0.3125 = 2.5
    assert((3 until 6).forall(out(_).getDouble(0) === 2.5))
  }

  test("bollinger: value at mean has pct_b 0.5; constant window nulls pct_b") {
    val out = Indicators.bollinger(series(1, 3, 2), "px", Seq("sym"), Seq("seq"), 3)
      .orderBy("seq").collect()
    // row 2 frame = (1,3,2): ma=2, value=2 -> centered
    assert(math.abs(out(2).getAs[Double]("pct_b") - 0.5) < 1e-9)
    // row 0 frame = (1): stddev_samp null -> pct_b null
    assert(out(0).isNullAt(out(0).fieldIndex("pct_b")))
    val const = Indicators.bollinger(series(4, 4, 4), "px", Seq("sym"), Seq("seq"), 3)
      .orderBy("seq").collect()
    assert(const.forall(r => r.isNullAt(r.fieldIndex("pct_b"))))
  }

  test("rollingTrend: monotone ramp is +1, fall is -1, short frames null") {
    val up = Indicators.rollingTrend(series(1, 2, 3, 4, 5), "px", "t", Seq("sym"), Seq("seq"), 10)
      .orderBy("seq").select("t").as[Option[Double]].collect()
    assert(up.head.isEmpty)                    // 1-row frame: corr undefined
    assert(up.tail.forall(_.contains(1.0)))
    val down = Indicators.rollingTrend(series(5, 4, 3, 2, 1), "px", "t", Seq("sym"), Seq("seq"), 10)
      .orderBy("seq").select("t").as[Option[Double]].collect()
    assert(down.tail.forall(_.contains(-1.0)))
    val flat = Indicators.rollingTrend(series(7, 7, 7), "px", "t", Seq("sym"), Seq("seq"), 10)
      .orderBy("seq").select("t").as[Option[Double]].collect()
    assert(flat.tail.forall(_.isEmpty))        // zero variance: null
  }

  test("atr: first bar uses high-low; gap bars widen the true range") {
    val ohlc = Seq(
      (0L, "A", 12.0, 10.0, 11.0),   // TR = 2 (no prev)
      (1L, "A", 13.0, 12.5, 13.0),   // gap up: TR = max(0.5, |13-11|=2, |12.5-11|=1.5) = 2
      (2L, "A", 13.2, 13.0, 13.1)    // TR = max(0.2, 0.2, 0.0) = 0.2
    ).toDF("seq", "sym", "high", "low", "close")
    val out = graft.analytics.Indicators.atr(ohlc, "high", "low", "close", "atr",
        Seq("sym"), Seq("seq"), 14)
      .orderBy("seq").select("atr").as[Double].collect()
    assert(math.abs(out(0) - 2.0) < 1e-9)
    assert(math.abs(out(1) - 2.0) < 1e-9)               // avg(2, 2)
    assert(math.abs(out(2) - (2.0 + 2.0 + 0.2) / 3) < 1e-6)
  }

  test("stochasticK: close at the range top is 100, at the bottom 0, flat range null") {
    val ohlc = Seq(
      (0L, "A", 10.0, 5.0, 10.0),    // close == hh -> 100
      (1L, "A", 11.0, 6.0, 6.0),     // close == ll(5? no: ll=min(5,6)=5) -> (6-5)/(11-5)
      (2L, "B", 7.0, 7.0, 7.0)       // degenerate range -> null
    ).toDF("seq", "sym", "high", "low", "close")
    val out = graft.analytics.Indicators.stochasticK(ohlc, "high", "low", "close", "k",
        Seq("sym"), Seq("seq"), 14)
      .orderBy("sym", "seq").collect()
    assert(out(0).getAs[Double]("k") === 100.0)
    assert(math.abs(out(1).getAs[Double]("k") - 100.0 / 6.0) < 1e-4)
    assert(out(2).isNullAt(out(2).fieldIndex("k")))
  }

  test("obv: up-bars add volume, down-bars subtract, flat bars contribute nothing") {
    val ohlc = Seq(
      (0L, "A", 10.0, 100.0),  // first bar: dir null -> 0
      (1L, "A", 12.0, 50.0),   // up -> +50
      (2L, "A", 11.0, 30.0),   // down -> -30
      (3L, "A", 11.0, 99.0)    // flat -> +0
    ).toDF("seq", "sym", "close", "vol")
    val out = graft.analytics.Indicators.obv(ohlc, "close", "vol", "obv",
        Seq("sym"), Seq("seq"))
      .orderBy("seq").select("obv").as[Double].collect()
    assert(out.toSeq === Seq(0.0, 50.0, 20.0, 20.0))
  }

  test("macd composition: fast EWMA above slow on an uptrend (positive macd)") {
    val up = series((1 to 30).map(_.toDouble): _*)
    val s1 = Indicators.ewma(up, "px", "e12", Seq("sym"), Seq("seq"), 2.0 / 13, 16)
    val s2 = Indicators.ewma(s1, "px", "e26", Seq("sym"), Seq("seq"), 2.0 / 27, 16)
    val last = s2.withColumn("macd", col("e12") - col("e26"))
      .orderBy("seq").select("macd").as[Double].collect().last
    // on a steady climb the fast average sits above the slow one
    assert(last > 0.5, s"macd on an uptrend should be clearly positive, got $last")
  }

  test("betaToBenchmark: amplified series has beta > 1, inverse series beta < 0") {
    // benchmark is the all-series mean; series 'hi' moves 2x the trend,
    // 'lo' moves with it, 'inv' moves against it
    val df = (0 until 20).flatMap { b =>
      Seq((b.toLong, "hi", 100.0 + 2.0 * b), (b.toLong, "lo", 100.0 + 1.0 * b),
        (b.toLong, "inv", 100.0 - 1.0 * b))
    }.toDF("bucket", "series", "v")
    val out = graft.analytics.Indicators.betaToBenchmark(df, "series", col("bucket"), "v")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("beta")).toMap
    // market slope = (2+1-1)/3 per bucket -> betas 3, 1.5, -1.5
    assert(math.abs(out("hi") - 3.0) < 1e-6)
    assert(math.abs(out("lo") - 1.5) < 1e-6)
    assert(math.abs(out("inv") + 1.5) < 1e-6)
  }

  test("betaToBenchmark: single-bucket series yields null beta (no variance)") {
    val df = Seq((0L, "only", 5.0)).toDF("bucket", "series", "v")
    val out = graft.analytics.Indicators.betaToBenchmark(df, "series", col("bucket"), "v")
      .collect().head
    assert(out.isNullAt(out.fieldIndex("beta")))
    assert(out.getAs[Long]("n_buckets") === 1)
  }

  test("pairwiseCorr: perfectly correlated and anti-correlated series") {
    val df = Seq(
      (0L, "a", 1.0), (0L, "b", 2.0), (0L, "c", 9.0),
      (1L, "a", 2.0), (1L, "b", 4.0), (1L, "c", 7.0),
      (2L, "a", 3.0), (2L, "b", 6.0), (2L, "c", 5.0)
    ).toDF("bucket", "series", "v")
    val out = Indicators.pairwiseCorr(df, "series", col("bucket"), "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("a", "b")) - 1.0) < 1e-6)   // b = 2a
    assert(math.abs(out(("a", "c")) + 1.0) < 1e-6)   // c = 11 - 2a
    assert(out.size === 3)                            // a<b, a<c, b<c only
  }

  test("ewma: constant series is the constant; head renormalizes over present lags") {
    val out = Indicators.ewma(series(7, 7, 7), "px", "ewma", Seq("sym"), Seq("seq"), 0.5, 10)
      .orderBy("seq").select("ewma").as[Double].collect()
    assert(out.forall(v => math.abs(v - 7.0) < 1e-9))
    // two-row series: ewma(1) = (1*x1 + 0.5*x0) / 1.5
    val two = Indicators.ewma(series(2, 8), "px", "ewma", Seq("sym"), Seq("seq"), 0.5, 10)
      .orderBy("seq").select("ewma").as[Double].collect()
    assert(math.abs(two(0) - 2.0) < 1e-9)                       // head: only own weight
    assert(math.abs(two(1) - (8.0 + 0.5 * 2.0) / 1.5) < 1e-6)
  }

  test("ewma weights recent rows more than a plain moving average") {
    // jump series: after a level shift, ewma should sit closer to the new level
    val vals = Seq.fill(10)(0.0) ++ Seq.fill(3)(10.0)
    val df = series(vals: _*)
    val e = Indicators.ewma(df, "px", "ewma", Seq("sym"), Seq("seq"), 0.5, 10)
      .orderBy("seq").select("ewma").as[Double].collect().last
    assert(e > 8.0, s"ewma after 3 rows at the new level was $e")
  }

  test("indicator invariants on harness events: rsi in [0,100], bands ordered, drawdown <= 0, ewma within window hull") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val rsi = Indicators.rsi(ev, "value", "rsi", Seq("user_id"), Seq("ts", "event_id"), 14)
    assert(rsi.filter(col("rsi") < 0 || col("rsi") > 100).count() === 0)

    val dd = Indicators.maxDrawdown(ev.filter(col("value") > 0), "value",
      Seq("user_id"), Seq("ts", "event_id"))
    assert(dd.filter(col("max_drawdown") > 0).count() === 0)
    assert(dd.filter(col("max_drawdown") < -1).count() === 0) // positive values: ratio >= 0

    // ewma is a convex combination of trailing values -> bounded by the
    // trailing-window min/max (same frame as the horizon)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")).rowsBetween(-9, 0)
    val e = Indicators.ewma(ev, "value", "ewma", Seq("user_id"), Seq("ts", "event_id"), 0.5, 10)
      .withColumn("lo", min(col("value")).over(w))
      .withColumn("hi", max(col("value")).over(w))
    assert(e.filter(col("ewma") < col("lo") - 1e-6 || col("ewma") > col("hi") + 1e-6).count() === 0)
  }

  test("indicators produce one row per input row (rsi/bollinger) on harness events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val n = ev.count()
    assert(Indicators.rsi(ev, "value", "rsi", Seq("user_id"), Seq("ts", "event_id"), 14).count() === n)
    val boll = Indicators.bollinger(ev, "value", Seq("user_id"), Seq("ts", "event_id"), 20)
    assert(boll.count() === n)
    // band ordering invariant wherever defined
    assert(boll.filter(col("upper") < col("lower")).count() === 0)
  }

  test("rollingZScore: prior frame excludes self, spike flags, warm-up and flat stay null/0") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: stable 10.0 x5 then a spike 100; user 2: constant (flat window)
    val rows = (0 until 5).map(i => (i.toLong, 1L, ts(f"2024-01-01 10:0$i:00"), 10.0 + (i % 2) * 0.2)) ++
      Seq((5L, 1L, ts("2024-01-01 10:05:00"), 100.0)) ++
      (10 until 13).map(i => (i.toLong, 2L, ts(f"2024-01-01 10:${i - 10}%02d:00"), 5.0))
    val out = Indicators.rollingZScore(
        rows.toDF("event_id", "user_id", "ts", "value"), "value",
        Seq("user_id"), Seq("ts", "event_id"), 20)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(r.fieldIndex("z"))), r.getInt(r.fieldIndex("is_anomaly"))))).toMap
    assert(out(0L) === ((None, 0)))            // first row: no prior frame
    assert(out(1L) === ((None, 0)))            // one prior row: stddev_samp null
    assert(out(5L)._1.exists(_.asInstanceOf[Double] > 3.0))
    assert(out(5L)._2 === 1)                   // spike vs stable history flags
    assert(out(4L)._2 === 0)                   // in-distribution row does not
    assert(out(12L) === ((None, 0)))           // flat window: z undefined, flag 0
  }

  test("rangeVolatility: hand-computed trio on one candle; non-positive low excluded; flat bar is zero") {
    val candles = Seq(
      ("A", "d1", 100.0, 110.0, 95.0, 105.0),  // hand-checked bar
      ("B", "d1", 50.0, 50.0, 50.0, 50.0),     // flat bar: all terms 0
      ("C", "d1", 1.0, 2.0, 0.0, 1.0)          // low=0: log-undefined, excluded
    ).toDF("sym", "day", "open", "high", "low", "close")
    val out = Indicators.rangeVolatility(
        candles, "open", "high", "low", "close", Seq("sym", "day"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("C"), "non-positive low must be excluded")
    def sr6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val lhl = math.log(110.0 / 95.0); val lco = math.log(105.0 / 100.0)
    assert(out("A").getAs[Double]("parkinson") ===
      sr6(lhl * lhl / Indicators.ParkinsonDenom))
    assert(out("A").getAs[Double]("garman_klass") ===
      sr6(0.5 * lhl * lhl - Indicators.GarmanKlassC * lco * lco))
    assert(out("A").getAs[Double]("rogers_satchell") ===
      sr6(math.log(110.0 / 105.0) * math.log(110.0 / 100.0)
        + math.log(95.0 / 105.0) * math.log(95.0 / 100.0)))
    Seq("parkinson", "garman_klass", "rogers_satchell").foreach { e =>
      assert(out("B").getAs[Double](e) === 0.0, s"flat bar $e")
    }
    // a drift-only bar (opens at the low, closes at the high, monotone):
    // RS is exactly zero — drift-independence, the estimator's defining
    // property — while Parkinson reads the full range as variance
    val drift = Seq(("D", "d1", 100.0, 120.0, 100.0, 120.0))
      .toDF("sym", "day", "open", "high", "low", "close")
    val d = Indicators.rangeVolatility(
        drift, "open", "high", "low", "close", Seq("sym", "day"))
      .collect().head
    assert(d.getAs[Double]("rogers_satchell") === 0.0)
    assert(d.getAs[Double]("parkinson") > 0.0)
  }

  test("autocorrelation: linear series is +1 at every lag, alternating is -1 at lag 1; degenerate cases null") {
    val lin = Indicators.autocorrelation(
      series(1, 2, 3, 4, 5, 6, 7, 8), "px", Seq("sym"), Seq("seq"), Seq(1, 2))
      .collect().head
    assert(lin.getAs[Double]("acf_1") === 1.0)
    assert(lin.getAs[Double]("acf_2") === 1.0)

    val alt = Indicators.autocorrelation(
      series(1, -1, 1, -1, 1, -1), "px", Seq("sym"), Seq("seq"), Seq(1, 2))
      .collect().head
    assert(alt.getAs[Double]("acf_1") === -1.0)
    assert(alt.getAs[Double]("acf_2") === 1.0)

    // constant series: Pearson undefined (NaN in Spark) -> SQL NULL
    val const = Indicators.autocorrelation(
      series(5, 5, 5, 5), "px", Seq("sym"), Seq("seq"), Seq(1)).collect().head
    assert(const.isNullAt(const.fieldIndex("acf_1")))
    // lag longer than the series: zero aligned pairs -> NULL
    val short = Indicators.autocorrelation(
      series(1, 2, 3), "px", Seq("sym"), Seq("seq"), Seq(5)).collect().head
    assert(short.isNullAt(short.fieldIndex("acf_5")))
  }

  test("varianceRatio: matches a scalar replication; zero-variance and short series null") {
    val vals = Seq(0.0, 1.0, 3.0, 2.0, 5.0, 4.0, 7.0, 6.0, 9.0, 8.0)
    val q = 5
    val out = Indicators.varianceRatio(
      series(vals: _*), "px", Seq("sym"), Seq("seq"), q).collect().head
    def varSamp(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val d1 = vals.sliding(2).map(p => p(1) - p(0)).toSeq
    val dq = vals.indices.drop(q).map(i => vals(i) - vals(i - q))
    val expVr = varSamp(dq) / (q * varSamp(d1))
    assert(out.getAs[Long]("n_q") === dq.size.toLong)
    assert(math.abs(out.getAs[Double]("vr") - expVr) < 1e-6)
    val expZ = (expVr - 1.0) * math.sqrt(3.0 * q * dq.size / (2.0 * (2 * q - 1) * (q - 1)))
    assert(math.abs(out.getAs[Double]("z_stat") - expZ) < 1e-6)

    // linear series: d1 variance is 0 -> no random-walk question, NULL
    val lin = Indicators.varianceRatio(
      series(1, 2, 3, 4, 5, 6, 7), "px", Seq("sym"), Seq("seq"), q).collect().head
    assert(lin.isNullAt(lin.fieldIndex("vr")))
    // two rows: a single 1-period diff has NaN var_samp -> folded to NULL
    val short = Indicators.varianceRatio(
      series(1, 4), "px", Seq("sym"), Seq("seq"), q).collect().head
    assert(short.isNullAt(short.fieldIndex("vr")))
  }

  test("hurstExponent: matches a scalar replication on a seeded walk; degenerate series null") {
    val rng = new scala.util.Random(7)
    val vals = Iterator.iterate(100.0)(_ + rng.nextGaussian()).take(200).toSeq
    val out = Indicators.hurstExponent(
      series(vals: _*), "px", Seq("sym"), Seq("seq")).collect().head

    def varSamp(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    def diffs(q: Int): Seq[Double] =
      vals.indices.drop(q).map(i => vals(i) - vals(i - q))
    val v1 = varSamp(diffs(1))
    val vrs = Indicators.HurstLags.map(q => varSamp(diffs(q)) / (q * v1))
    val ys = vrs.map(math.log)
    val sxy = Indicators.HurstX.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (4.0 * sxy - Indicators.HurstSumX * ys.sum) / Indicators.HurstDenom
    val expH = (1.0 + slope) / 2.0
    assert(math.abs(out.getAs[Double]("hurst") - expH) < 1e-5, s"got $out want $expH")
    // a gaussian walk should read near 0.5
    assert(math.abs(out.getAs[Double]("hurst") - 0.5) < 0.25)
    Indicators.HurstLags.foreach { q =>
      assert(math.abs(out.getAs[Double](s"vr_$q") - vrs(Indicators.HurstLags.indexOf(q))) < 1e-6)
    }

    // linear trend: zero 1-period variance -> null
    val lin = Indicators.hurstExponent(
      series((1 to 40).map(_.toDouble): _*), "px", Seq("sym"), Seq("seq"))
      .collect().head
    assert(lin.isNullAt(lin.fieldIndex("hurst")))
    // alternating series: even-lag diffs are constant (VR = 0) -> null
    val alt = Indicators.hurstExponent(
      series(Seq.fill(20)(Seq(1.0, 2.0)).flatten: _*), "px", Seq("sym"), Seq("seq"))
      .collect().head
    assert(alt.isNullAt(alt.fieldIndex("hurst")))
  }

  test("rollingBeta: exact slope on a linear pair; ANSI-safe head frame; flat benchmark null") {
    val df = Seq(
      ("A", 1L, 2.0, 1.0), ("A", 2L, 4.0, 2.0),
      ("A", 3L, 6.0, 3.0), ("A", 4L, 8.0, 4.0),
      ("B", 1L, 1.0, 5.0), ("B", 2L, 7.0, 5.0), ("B", 3L, 3.0, 5.0)
    ).toDF("sym", "seq", "x", "y")
    val out = Indicators.rollingBeta(df, "x", "y", "beta",
      Seq("sym"), Seq("seq"), n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // x = 2y exactly: beta = 2 wherever the frame holds >= 2 pairs
    assert(out(("A", 1L)).isNullAt(out(("A", 1L)).fieldIndex("beta"))) // 1-row head: no throw, null
    assert(out(("A", 2L)).getAs[Double]("beta") === 2.0)
    assert(out(("A", 4L)).getAs[Double]("beta") === 2.0)
    // flat benchmark: zero variance at every frame
    Seq(1L, 2L, 3L).foreach { i =>
      assert(out(("B", i)).isNullAt(out(("B", i)).fieldIndex("beta")))
    }
    // a null on either side drops the pair from the frame
    val withNull = Seq(
      ("C", 1L, Some(2.0), Some(1.0)), ("C", 2L, None, Some(9.0)),
      ("C", 3L, Some(6.0), Some(3.0))
    ).toDF("sym", "seq", "x", "y")
    val c = Indicators.rollingBeta(withNull, "x", "y", "beta",
      Seq("sym"), Seq("seq"), n = 3)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(c(3L).getAs[Double]("beta") === 2.0) // pairs (2,1) and (6,3) only
  }

  test("neweyWestTStat matches the hand-rolled Bartlett long-run variance") {
    val xs = Seq(0.03, -0.01, 0.02, 0.04, -0.02, 0.01, 0.03, -0.01, 0.02, 0.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("A", i.toLong, v) }
      .toDF("sym", "seq", "r")
    val maxLag = 3
    val out = Indicators.neweyWestTStat(df, "r", Seq("sym"), Seq("seq"), maxLag)
      .collect().head
    val n = xs.length
    val mu = xs.sum / n
    def gamma(j: Int) =
      (j until n).map(t => (xs(t) - mu) * (xs(t - j) - mu)).sum / n
    val lrv = gamma(0) + (1 to maxLag)
      .map(j => 2.0 * (1.0 - j.toDouble / (maxLag + 1)) * gamma(j)).sum
    def sr6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(out.getAs[Long]("n") === n.toLong)
    assert(math.abs(out.getAs[Double]("mean") - sr6(mu)) < 1e-9)
    assert(math.abs(out.getAs[Double]("t_iid") - sr6(mu / math.sqrt(gamma(0) / n))) < 1e-6)
    assert(math.abs(out.getAs[Double]("t_nw") - sr6(mu / math.sqrt(lrv / n))) < 1e-6)
    // positive autocorrelation must deflate the robust t below iid here?
    // not asserted in general — sign depends on the sample ACF; the
    // relationship IS pinned: lrv vs gamma0 ordering drives it
    assert((out.getAs[Double]("t_nw") < out.getAs[Double]("t_iid")) === (lrv > gamma(0)))
  }

  test("neweyWestTStat guards: constant series and too-short series yield null t") {
    val df = (Seq.fill(8)(0.5).zipWithIndex.map { case (v, i) => ("C", i.toLong, v) }
      ++ Seq(0.1, 0.2, 0.3).zipWithIndex.map { case (v, i) => ("S", i.toLong, v) })
      .toDF("sym", "seq", "r")
    val out = Indicators.neweyWestTStat(df, "r", Seq("sym"), Seq("seq"), maxLag = 5)
      .collect().map(r => r.getAs[String]("sym") -> r).toMap
    val c = out("C") // constant: gamma0 = 0
    assert(c.isNullAt(c.fieldIndex("t_iid")) && c.isNullAt(c.fieldIndex("t_nw")))
    val s = out("S") // n = 3 <= maxLag
    assert(s.isNullAt(s.fieldIndex("t_iid")) && s.isNullAt(s.fieldIndex("t_nw")))
  }
}
