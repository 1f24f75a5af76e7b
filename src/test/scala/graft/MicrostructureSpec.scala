package graft

import org.apache.spark.sql.functions._

import graft.analytics.Microstructure

class MicrostructureSpec extends SparkSpec {
  import spark.implicits._

  private def sr6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6

  test("vpin: hand-computed bucket — zero-change carry, unclassified head, exact net") {
    // prices 10, 10, 11, 11, 9 -> signs 0 (first), 0 (no prior change),
    // +1, +1 (carried through the zero change), -1 => net = 1
    val df = Seq(10.0, 10.0, 11.0, 11.0, 9.0).zipWithIndex
      .map { case (p, i) => ("A", i.toLong, p) }.toDF("sym", "seq", "px")
    val out = Microstructure.vpin(df, "sym", Seq("seq"), "px",
      bucketTicks = 5, window = 2).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_ticks") === 5L && r.getAs[Long]("net") === 1L)
    assert(r.getAs[Double]("vpin") === 0.2)
    assert(r.getAs[Double]("vpin_roll") === 0.2)
  }

  test("vpin rolling form is the ratio of integer sums across buckets, partial bucket kept") {
    // 7 monotone-up ticks, buckets of 3: nets 2 (first sign is 0), 3, 1;
    // rolling over 2 buckets: 2/3, 5/6, 4/4
    val df = (1 to 7).map(i => ("A", i.toLong, i.toDouble)).toDF("sym", "seq", "px")
    val out = Microstructure.vpin(df, "sym", Seq("seq"), "px", 3, 2)
      .orderBy("bucket").collect()
    assert(out.map(_.getAs[Long]("net")).toSeq === Seq(2L, 3L, 1L))
    assert(out.map(_.getAs[Double]("vpin_roll")).toSeq ===
      Seq(sr6(2.0 / 3.0), sr6(5.0 / 6.0), 1.0))
  }

  test("kyleRoll: bid-ask bounce yields the Roll spread; trend yields zero lambda") {
    // alternating +-0.5 around a flat mid: d alternates -1, +1 ->
    // covar_samp over the 4 (d, dprev) pairs = -4/3
    val bounce = Seq(10.5, 9.5, 10.5, 9.5, 10.5, 9.5).zipWithIndex
      .map { case (p, i) => ("B", "d1", i.toLong, p) }
    // monotone trend: d constant 1 -> cov(d, flow) = 0 -> lambda 0; and
    // d_prev serial cov = 0 (not negative) -> roll null
    val trend = (1 to 6).map(i => ("T", "d1", i.toLong, i.toDouble))
    val out = Microstructure.kyleRoll(
        (bounce ++ trend).toDF("sym", "day", "seq", "px"),
        Seq("sym", "day"), Seq("seq"), "px")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("B").getAs[Double]("roll_spread") === sr6(2.0 * math.sqrt(4.0 / 3.0)))
    assert(out("T").getAs[Double]("kyle_lambda") === 0.0)
    assert(out("T").isNullAt(out("T").fieldIndex("roll_spread")))
    // flat series: flow proxy has zero variance -> lambda undefined
    val flat = Seq.fill(5)(7.0).zipWithIndex.map { case (p, i) => ("F", "d1", i.toLong, p) }
    val f = Microstructure.kyleRoll(flat.toDF("sym", "day", "seq", "px"),
      Seq("sym", "day"), Seq("seq"), "px").collect().head
    assert(f.isNullAt(f.fieldIndex("kyle_lambda")))
  }

  test("amihud: last close by order, summed volume, first day and zero-volume day null") {
    val bars = Seq(
      // (sym, day, bucket, close, volume) — d1 has two bars: close must
      // come from the LATER bucket (101), volume sums to 10
      ("A", "d1", 1L, 99.0, 4.0), ("A", "d1", 2L, 101.0, 6.0),
      ("A", "d2", 3L, 111.1, 20.0),
      ("A", "d3", 4L, 100.0, 0.0),   // zero volume: no per-unit reading
      ("B", "d1", 1L, 50.0, 5.0)
    ).toDF("sym", "day", "bucket", "close", "volume")
    val out = Microstructure.amihud(bars, Seq("sym"), "day", "bucket",
      "close", "volume", rollDays = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val d1 = out(("A", "d1"))
    assert(d1.getAs[Long]("n_bars") === 2L && d1.getAs[Double]("volume") === 10.0)
    assert(d1.isNullAt(d1.fieldIndex("ret")))        // no previous close
    assert(d1.isNullAt(d1.fieldIndex("illiq")))
    assert(d1.isNullAt(d1.fieldIndex("illiq_roll"))) // all-null frame
    val d2 = out(("A", "d2"))
    val expRet = 111.1 / 101.0 - 1.0
    assert(d2.getAs[Double]("ret") === sr6(expRet))
    val expIlliq = math.abs(expRet) / 20.0 * 1e6
    assert(d2.getAs[Double]("illiq") === sr6(expIlliq))
    assert(d2.getAs[Double]("illiq_roll") === sr6(expIlliq)) // d1 null skipped
    val d3 = out(("A", "d3"))
    assert(d3.isNullAt(d3.fieldIndex("illiq")))      // zero volume
    assert(d3.getAs[Double]("illiq_roll") === sr6(expIlliq)) // still only d2 valid
  }

  test("corwinSchultz: scalar replication on two days; first day null; negative estimate floors to 0") {
    val ticks = Seq(
      // identical consecutive day ranges: beta = 2r², gamma = r² with
      // r = ln(102/98) -> alpha reduces to exactly r > 0, positive spread
      ("A", "d1", 98.0), ("A", "d1", 102.0),
      ("A", "d2", 98.0), ("A", "d2", 102.0),
      // key B: disjoint day ranges (big 2-day range vs daily ranges)
      // -> gamma dominates, alpha < 0, spread clamps to 0
      ("B", "d1", 100.0), ("B", "d1", 100.5),
      ("B", "d2", 130.0), ("B", "d2", 130.5)
    ).toDF("sym", "day", "px")
    val out = Microstructure.corwinSchultz(ticks, Seq("sym"), "day", "px")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("A", "d1")).isNullAt(out(("A", "d1")).fieldIndex("spread")))

    def cs(h1: Double, l1: Double, h2: Double, l2: Double): Double = {
      val beta = math.pow(math.log(h2 / l2), 2) + math.pow(math.log(h1 / l1), 2)
      val g = math.log(math.max(h2, h1) / math.min(l2, l1))
      val k = Microstructure.CorwinSchultzK
      val alpha = (math.sqrt(2 * beta) - math.sqrt(beta)) / k - math.sqrt(g * g / k)
      2.0 * (math.exp(alpha) - 1.0) / (math.exp(alpha) + 1.0)
    }
    val a2 = out(("A", "d2"))
    assert(math.abs(a2.getAs[Double]("spread_raw") - cs(102, 98, 102, 98)) < 1e-6)
    assert(a2.getAs[Double]("spread_raw") > 0.0)
    assert(a2.getAs[Double]("spread") === a2.getAs[Double]("spread_raw"))
    val b2 = out(("B", "d2"))
    assert(b2.getAs[Double]("spread_raw") < 0.0, b2.toString)
    assert(b2.getAs[Double]("spread") === 0.0)
  }
}
