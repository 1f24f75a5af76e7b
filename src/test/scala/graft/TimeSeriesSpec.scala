package graft

import org.apache.spark.sql.functions._

import graft.analytics.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("candles aggregate OHLCV deterministically (open/close by seq)") {
    val df = Seq(
      (1L, "A", "2024-01-01 10:00:10", 10.0, 1.0),
      (2L, "A", "2024-01-01 10:01:20", 30.0, 1.0),
      (3L, "A", "2024-01-01 10:03:30", 5.0, 1.0),
      (4L, "A", "2024-01-01 10:07:00", 7.0, 1.0)
    ).toDF("seq", "sym", "t", "px", "vol").withColumn("t", col("t").cast("timestamp"))
    val out = TimeSeries.candles(col("t"), col("sym"), col("px"), col("vol"), col("seq"), "5 minutes")(df)
      .orderBy("bucket_start").collect()
    assert(out.length === 2)
    val first = out.head
    assert(first.getAs[Double]("open") === 10.0)  // seq 1
    assert(first.getAs[Double]("high") === 30.0)
    assert(first.getAs[Double]("low") === 5.0)
    assert(first.getAs[Double]("close") === 5.0)  // seq 3
    assert(first.getAs[Double]("volume") === 3.0)
  }

  test("candle invariants hold on harness events (property-ish)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val c = TimeSeries.candles(col("ts"), col("event_type"), col("value"), col("value"), col("event_id"), "5 minutes")(ev)
    assert(c.filter(col("high") < col("open") || col("high") < col("close") ||
      col("low") > col("open") || col("low") > col("close")).count() === 0)
  }

  test("asOfJoin matches most recent right row at-or-before left ts; inclusive on ties") {
    val left = Seq((1L, "u1", "2024-01-01 10:05:00"), (2L, "u1", "2024-01-01 10:00:00"),
      (3L, "u2", "2024-01-01 09:00:00")).toDF("lid", "k", "lts")
      .withColumn("lts", col("lts").cast("timestamp"))
    val right = Seq(("u1", "2024-01-01 10:00:00", 100.0), ("u1", "2024-01-01 10:03:00", 200.0))
      .toDF("k", "rts", "rv").withColumn("rts", col("rts").cast("timestamp"))
      .withColumn("rv2", col("rv"))
    val out = TimeSeries.asOfJoin(left, right, "k", "lts", "rts", Seq("rv")).orderBy("lid").collect()
    assert(out(0).getAs[Double]("rv") === 200.0)   // 10:05 -> 10:03
    assert(out(1).getAs[Double]("rv") === 100.0)   // 10:00 -> 10:00 (inclusive)
    assert(out(2).isNullAt(out(2).fieldIndex("rv"))) // u2: no right rows
  }

  test("topNPerGroup is deterministic with a total order") {
    val df = Seq(("g", 5.0, 1L), ("g", 5.0, 2L), ("g", 3.0, 3L)).toDF("k", "v", "id")
    val out = TimeSeries.topNPerGroup(Seq(col("k")), Seq(col("v").desc, col("id")), 2)(df).collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L))
  }

  test("asOfJoin == naive argmax formulation on harness events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("ts").as("view_ts"))
    val fast = TimeSeries.asOfJoin(purchases, views, "user_id", "ts", "ts", Seq("view_ts"))
      .select(col("event_id"), col("view_ts"))
    // naive: per purchase, the max view_ts <= purchase ts for the user
    val naive = purchases.as("p")
      .join(views.select(col("user_id").as("vu"), col("view_ts")),
        col("user_id") === col("vu") && col("view_ts") <= col("ts"), "left_outer")
      .groupBy(col("event_id")).agg(max(col("view_ts")).as("view_ts"))
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
    assert(fast.count() > 0)
  }

  test("boundedRangeJoin == naive theta join on harness events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val errors = ev.filter(col("event_type") === "error").select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("click_id"))
    val bucketed = TimeSeries.boundedRangeJoin(
      errors, clicks.select(col("cu").as("user_id"), col("cts").as("ts"), col("click_id")),
      "user_id", "ts", "ts", 300L, Seq("click_id"))
      .select(col("event_id"), col("r_click_id"))
    val naive = errors.join(clicks,
        col("user_id") === col("cu") &&
          col("cts") > col("ts") - expr("INTERVAL 300 seconds") && col("cts") <= col("ts"))
      .select(col("event_id"), col("click_id").as("r_click_id"))
    assert(bucketed.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(bucketed).count() === 0)
    assert(naive.count() > 0)
  }

  test("vwap weights by volume") {
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("px", "vol")
    val got = df.agg(TimeSeries.vwap(col("px"), col("vol")).as("vwap")).collect().head.getDouble(0)
    assert(math.abs(got - 17.5) < 1e-12)
  }

  test("twap: duration-weighted, last row weightless, single-row day degrades to its value") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // value 10 holds 3 minutes, then 20 holds 1 minute, then 40 (last, no weight)
      (1L, "A", ts("2024-01-01 10:00:00"), 10.0),
      (2L, "A", ts("2024-01-01 10:03:00"), 20.0),
      (3L, "A", ts("2024-01-01 10:04:00"), 40.0),
      (4L, "B", ts("2024-01-01 09:00:00"), 7.5)   // single observation
    ).toDF("event_id", "event_type", "ts", "value")
    val out = TimeSeries.twap(events, "event_type", "ts", "event_id", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    // A: (10*180 + 20*60) / 240 = 12.5; simple avg (10+20+40)/3
    assert(out("A").getAs[Double]("twap") === 12.5)
    assert(out("A").getAs[Double]("simple_avg") ===
      math.floor((70.0 / 3) * 1e6 + 0.5) / 1e6)
    assert(out("A").getAs[Long]("n") === 3)
    assert(out("B").getAs[Double]("twap") === 7.5)
    assert(out("B").getAs[String]("day") === "2024-01-01")
  }

  test("asOfJoinTolerance: fresh match kept with exact lag, stale match nulls out, no-match stays null") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val trades = Seq(
      (1L, "u1", ts("2024-01-01 10:30:00")),  // quote 30s earlier: fresh
      (2L, "u2", ts("2024-01-01 10:30:00")),  // quote 10min+1s earlier: stale
      (3L, "u3", ts("2024-01-01 10:30:00"))   // no quote at all
    ).toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      ("u1", ts("2024-01-01 10:29:30"), 1.5),
      ("u2", ts("2024-01-01 10:19:59"), 2.5)
    ).toDF("user_id", "ts", "px")
    val out = TimeSeries.asOfJoinTolerance(trades, quotes, "user_id", "ts", "ts",
        Seq("px"), toleranceUs = 600L * 1000000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("px") === 1.5)
    assert(out(1L).getAs[Long]("lag_us") === 30L * 1000000L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("px")))       // stale -> nulled
    assert(out(2L).isNullAt(out(2L).fieldIndex("lag_us")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("px")))       // left-outer preserved
    assert(out.size === 3)
  }

  test("resampleFfill: oversized grid fails in-plan with the remedy named") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val bars = Seq(
      ("A", ts("2020-01-01 00:00:00"), 1.0),
      ("A", ts("2024-01-01 00:00:00"), 2.0)   // 4 years at 1s step >> 1000 slots
    ).toDF("key", "bucket_start", "close")
    val e = intercept[Exception] {
      TimeSeries.resampleFfill(bars, "key", "bucket_start", "close", 1L,
        maxGridPerKey = 1000L).collect()
    }
    assert(e.getMessage.contains("maxGridPerKey"), e.getMessage)
    assert(e.getMessage.contains("coarser step"), e.getMessage)
  }

  test("volumeBars: a bar closes with the crossing row; OHLC by seq; partial tail bar kept") {
    val ticks = Seq(
      (1L, "A", 5.0), (2L, "A", 4.0), (3L, "A", 3.0),  // cumExcl 0,5,9 -> bar 0
      (4L, "A", 6.0), (5L, "A", 2.0)                   // cumExcl 12,18 -> bar 1
    ).toDF("seq", "sym", "v")
    val out = TimeSeries.volumeBars(ticks, "sym", Seq("seq"), "v", "v", "seq", 10.0)
      .collect().map(r => r.getAs[Long]("bar") -> r).toMap
    assert(out.size === 2)
    assert(out(0L).getAs[Long]("n_ticks") === 3)
    assert(out(0L).getAs[Double]("open") === 5.0)
    assert(out(0L).getAs[Double]("close") === 3.0)
    assert(out(0L).getAs[Double]("volume") === 12.0)   // >= threshold: closed by row 3
    assert(out(1L).getAs[Long]("n_ticks") === 2)
    assert(out(1L).getAs[Double]("open") === 6.0)
    assert(out(1L).getAs[Double]("low") === 2.0)
    assert(out(1L).getAs[Double]("volume") === 8.0)    // partial final bar
  }

  test("volumeBars: micro-quantized integer cumsum is immune to double rounding at the threshold") {
    // ten ticks of volume 0.1 with threshold 0.5: the DOUBLE cumsum of
    // five 0.1s is 0.5000000000000001 (> 0.5), which would leak the 6th
    // tick into bar 0; the exact integer path puts exactly 5 ticks per bar
    val ticks = (1 to 10).map(i => (i.toLong, "A", 1.0, 0.1))
      .toDF("seq", "sym", "px", "vol")
    val out = TimeSeries.volumeBars(ticks, "sym", Seq("seq"), "px", "vol", "seq", 0.5)
      .collect().map(r => r.getAs[Long]("bar") -> r.getAs[Long]("n_ticks")).toMap
    assert(out === Map(0L -> 5L, 1L -> 5L))
  }

  test("volumeBars: negative volume fails in-plan with the contract named") {
    val ticks = Seq((1L, "A", 1.0, 5.0), (2L, "A", 1.0, -1.0))
      .toDF("seq", "sym", "px", "vol")
    val e = intercept[Exception] {
      TimeSeries.volumeBars(ticks, "sym", Seq("seq"), "px", "vol", "seq", 10.0).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("negative volume"), msgs)
  }

  test("resampleLinear: holes carry the straight line between the surrounding prints") {
    val bars = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      // 10:05 and 10:10 missing — double-width hole, lerp 2.0 then 3.0
      ("A", ts("2024-01-01 10:15:00"), 4.0),
      ("A", ts("2024-01-01 10:20:00"), 5.0),
      ("B", ts("2024-01-01 09:00:00"), 7.0)   // single bar: 1-slot grid
    ).toDF("key", "bucket_start", "close")
    val out = TimeSeries.resampleLinear(bars, "key", "bucket_start", "close", 300L)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) -> r).toMap
    assert(out.size === 6)                               // 5 A slots + 1 B slot
    assert(out(("A", "2024-01-01 10:05:00.0")).getAs[Double]("lerp") === 2.0)
    assert(out(("A", "2024-01-01 10:10:00.0")).getAs[Double]("lerp") === 3.0)
    assert(out(("A", "2024-01-01 10:05:00.0")).getAs[Int]("is_gap") === 1)
    // observed rows pass through unchanged
    assert(out(("A", "2024-01-01 10:00:00.0")).getAs[Double]("lerp") === 1.0)
    assert(out(("A", "2024-01-01 10:15:00.0")).getAs[Double]("lerp") === 4.0)
    assert(out(("B", "2024-01-01 09:00:00.0")).getAs[Double]("lerp") === 7.0)
  }

  test("resampleLinear: null-valued prints fall back to the nearest known edge") {
    // a null VALUE inside the bar frame exercises the edge branches the
    // self-contained bounds otherwise make unreachable (grid min/max
    // always hold a bar, but that bar's value may be null)
    val bars = Seq(
      ("A", ts("2024-01-01 10:00:00"), Option.empty[Double]),  // leading null
      ("A", ts("2024-01-01 10:05:00"), Some(2.0)),
      ("A", ts("2024-01-01 10:15:00"), Some(4.0)),
      ("A", ts("2024-01-01 10:20:00"), Option.empty[Double])   // trailing null
    ).toDF("key", "bucket_start", "close")
    val out = TimeSeries.resampleLinear(bars, "key", "bucket_start", "close", 300L)
      .collect().map(r => r.getTimestamp(1).toString -> r).toMap
    assert(out("2024-01-01 10:00:00.0").getAs[Double]("lerp") === 2.0)  // bfill edge
    assert(out("2024-01-01 10:10:00.0").getAs[Double]("lerp") === 3.0)  // interior lerp
    assert(out("2024-01-01 10:20:00.0").getAs[Double]("lerp") === 4.0)  // ffill edge
    assert(out("2024-01-01 10:00:00.0").getAs[Int]("is_gap") === 1)
  }

  test("resampleFfill: holes filled from the latest earlier bar, grid complete per key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val bars = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      // 10:05 and 10:10 missing — double-width hole
      ("A", ts("2024-01-01 10:15:00"), 4.0),
      ("A", ts("2024-01-01 10:20:00"), 5.0),
      ("B", ts("2024-01-01 09:00:00"), 7.0)       // single bar: 1-row grid
    ).toDF("key", "bucket_start", "close")
    val out = TimeSeries.resampleFfill(bars, "key", "bucket_start", "close", 300L)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3), r.getInt(4))).toMap
    assert(out.size === 6)                         // A: 5 grid slots, B: 1
    assert(out(("A", "2024-01-01 10:00:00.0")) === ((Some(1.0), 1.0, 0)))
    assert(out(("A", "2024-01-01 10:05:00.0")) === ((None, 1.0, 1)))   // carried
    assert(out(("A", "2024-01-01 10:10:00.0")) === ((None, 1.0, 1)))   // still carried
    assert(out(("A", "2024-01-01 10:15:00.0")) === ((Some(4.0), 4.0, 0)))
    assert(out(("A", "2024-01-01 10:20:00.0")) === ((Some(5.0), 5.0, 0)))
    assert(out(("B", "2024-01-01 09:00:00.0")) === ((Some(7.0), 7.0, 0)))
  }

  test("adjustedClose: hand-computed split + dividend back-adjustment; latest bar unadjusted") {
    // key A: 2:1 split at t3, $1 dividend at t5 off a $20 base.
    //   f(split) = 1/2 = 0.5; f(div) = 1 - 1/20 = 0.95
    //   adj(t1) = 10 * (0.5 * 0.95) = 4.75   (both events after t1)
    //   adj(t2) = 20 * 0.475 = 9.5
    //   adj(t3) = 11 * 0.95  = 10.45         (split at t3 scales only t<t3)
    //   adj(t4) = 20 * 0.95  = 19.0
    //   adj(t5) = 21 * 1.0   = 21.0          (latest event; nothing after)
    //   adj(t6) = 22 * 1.0   = 22.0
    // key B: no events — adj == close everywhere.
    val bars = Seq(
      ("A", "t1", 10.0, 0.0, 0.0),
      ("A", "t2", 20.0, 0.0, 0.0),
      ("A", "t3", 11.0, 0.0, 2.0),
      ("A", "t4", 20.0, 0.0, 0.0),
      ("A", "t5", 21.0, 1.0, 0.0),
      ("A", "t6", 22.0, 0.0, 0.0),
      ("B", "t1", 5.0, 0.0, 0.0)
    ).toDF("sym", "t", "close", "dividend", "split")
    val out = TimeSeries.adjustedClose(bars, "sym", "t", "close", "dividend", "split")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("adj_close")).toMap
    assert(math.abs(out(("A", "t1")) - 4.75) < 1e-9, out(("A", "t1")).toString)
    assert(math.abs(out(("A", "t2")) - 9.5) < 1e-9)
    assert(math.abs(out(("A", "t3")) - 10.45) < 1e-9)
    assert(math.abs(out(("A", "t4")) - 19.0) < 1e-9)
    assert(out(("A", "t5")) === 21.0 && out(("A", "t6")) === 22.0)
    assert(out(("B", "t1")) === 5.0)
  }

  test("adjustedClose guards: dividend >= prior close and non-positive split fail with named errors; first-bar dividend adjusts nothing") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val badDiv = Seq(
      ("A", "t1", 10.0, 0.0, 0.0), ("A", "t2", 20.0, 10.0, 0.0))
      .toDF("sym", "t", "close", "dividend", "split")
    val e1 = intercept[Exception] {
      TimeSeries.adjustedClose(badDiv, "sym", "t", "close", "dividend", "split").collect()
    }
    assert(chain(e1).contains("dividend") && chain(e1).contains("prior close"),
      chain(e1))
    val negDiv = Seq(
      ("A", "t1", 10.0, 0.0, 0.0), ("A", "t2", 20.0, -1.0, 0.0))
      .toDF("sym", "t", "close", "dividend", "split")
    val e1b = intercept[Exception] {
      TimeSeries.adjustedClose(negDiv, "sym", "t", "close", "dividend", "split").collect()
    }
    assert(chain(e1b).contains("dividend"), chain(e1b))
    val badSplit = Seq(("A", "t1", 10.0, 0.0, -2.0))
      .toDF("sym", "t", "close", "dividend", "split")
    val e2 = intercept[Exception] {
      TimeSeries.adjustedClose(badSplit, "sym", "t", "close", "dividend", "split").collect()
    }
    assert(chain(e2).contains("non-positive split"), chain(e2))
    // a dividend on the FIRST bar has no base price: factor degrades to
    // the split term (here 1.0) and nothing earlier exists to scale
    val firstDiv = Seq(
      ("A", "t1", 10.0, 1.0, 0.0), ("A", "t2", 20.0, 0.0, 0.0))
      .toDF("sym", "t", "close", "dividend", "split")
    val out = TimeSeries.adjustedClose(firstDiv, "sym", "t", "close", "dividend", "split")
      .collect().map(r => r.getString(1) -> r.getAs[Double]("adj_close")).toMap
    assert(out("t1") === 10.0 && out("t2") === 20.0)
    // duplicate (key, time) bars make the lag() base price
    // nondeterministic — they must fail loudly IN-PLAN (the r14-advice
    // uniqueness guard, riding the existing keyed window), even when no
    // real corporate action exists anywhere in the frame
    val dupBars = Seq(
      ("A", "t1", 10.0, 0.0, 0.0), ("A", "t1", 11.0, 0.0, 0.0),
      ("A", "t2", 12.0, 0.0, 0.0))
      .toDF("sym", "t", "close", "dividend", "split")
    val e3 = intercept[Exception] {
      TimeSeries.adjustedClose(dupBars, "sym", "t", "close", "dividend", "split").collect()
    }
    assert(chain(e3).contains("duplicate bar"), chain(e3))
  }

  test("adjustedClose invariants: no events is identity; a lone k:1 split scales exactly the pre-split history by 1/k") {
    // identity: a 40-bar random-ish walk with zero dividends/splits must
    // come back bit-identical (factor product over an empty list = 1.0)
    val walk = (0 until 40).map(i =>
      ("W", f"t$i%02d", 100.0 + (i * 37 % 11) - 5.0, 0.0, 0.0))
    val idOut = TimeSeries.adjustedClose(
        walk.toDF("sym", "t", "close", "dividend", "split"),
        "sym", "t", "close", "dividend", "split")
      .collect().map(r => r.getString(1) -> r.getAs[Double]("adj_close")).toMap
    walk.foreach { case (_, t, c, _, _) => assert(idOut(t) === c, t) }
    // a single 4:1 split at t20: every bar BEFORE t20 scales by exactly
    // 0.25 (a dyadic factor — bit-exact), t20 onward untouched
    val split = walk.map { case (s, t, c, d, _) =>
      (s, t, c, d, if (t == "t20") 4.0 else 0.0) }
    val spOut = TimeSeries.adjustedClose(
        split.toDF("sym", "t", "close", "dividend", "split"),
        "sym", "t", "close", "dividend", "split")
      .collect().map(r => r.getString(1) -> r.getAs[Double]("adj_close")).toMap
    walk.foreach { case (_, t, c, _, _) =>
      if (t < "t20") assert(spOut(t) === c * 0.25, t)
      else assert(spOut(t) === c, t)
    }
  }
}
