package graft.streaming

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps._

/** Pure fold-level chop-invariance properties for the stateful
  * recurrences — no SparkSession: the single-test chop in StatefulSpec
  * pins one boundary placement; these sample hundreds of random series
  * AND random chop points, so a state-carry bug that only shows at a
  * particular boundary (mid-bar, exactly-on-trigger, first-row) cannot
  * hide. Same manual fixed-seed sampling discipline as PropertySpec
  * (the scalatestplus bridge is not in the offline cache).
  */
class FoldPropertySpec extends AnyFunSuite {

  private val seriesGen: Gen[List[TickerTick]] = for {
    n <- Gen.choose(0, 60)
    prices <- Gen.listOfN(n, Gen.choose(1.0, 200.0))
    vols <- Gen.listOfN(n, Gen.choose(0, 12))
  } yield prices.zip(vols).zipWithIndex.map { case ((p, v), i) =>
    TickerTick("K", new Timestamp(1700000000000L + i * 1000L), p.toFloat, v)
  }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen failed"))

  /** Chop `xs` at random points into 1..5 batches. */
  private def chops(xs: List[TickerTick], seed: Long): List[List[TickerTick]] = {
    if (xs.isEmpty) return List(Nil)
    val nCuts = sample(Gen.choose(0, 4), seed)
    val cuts = sample(Gen.listOfN(nCuts, Gen.choose(0, xs.size)), seed + 1).distinct.sorted
    val bounds = (0 :: cuts) :+ xs.size
    bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
  }

  test("cusumFold: chopped fold emits exactly the whole-series events, any boundary") {
    for (seed <- 1L to 200L) {
      val series = sample(seriesGen, seed)
      val h = sample(Gen.choose(5.0, 80.0), seed + 1000)
      val (_, whole) = StatefulOps.cusumFold(None, series, h)
      var st: Option[CusumState] = None
      val emitted = List.newBuilder[(TickerTick, Int, Long)]
      chops(series, seed + 2000).foreach { batch =>
        val (s2, ev) = StatefulOps.cusumFold(st, batch, h)
        st = s2; emitted ++= ev
      }
      assert(emitted.result() === whole.toList, s"seed=$seed h=$h")
    }
  }

  test("volumeBarFold: chopped closed bars + final state == whole-series fold, any boundary") {
    for (seed <- 1L to 200L) {
      val series = sample(seriesGen, seed)
      val thresholdMicros = sample(Gen.choose(1L, 40L), seed + 1000) * 1000000L
      val (wholeState, wholeClosed) =
        StatefulOps.volumeBarFold(None, series, thresholdMicros)
      var st: Option[VolumeBarState] = None
      val closed = List.newBuilder[VolumeBarState]
      chops(series, seed + 2000).foreach { batch =>
        val (s2, c) = StatefulOps.volumeBarFold(st, batch, thresholdMicros)
        st = s2; closed ++= c
      }
      assert(closed.result() === wholeClosed.toList, s"seed=$seed t=$thresholdMicros")
      assert(st === wholeState, s"seed=$seed t=$thresholdMicros")
    }
  }

  // coarse prices from a 6-value grid: repeated prints are common, so
  // the tick rule's zero-change sign-carry branch exercises for real
  private val coarseSeriesGen: Gen[List[TickerTick]] = for {
    n <- Gen.choose(0, 60)
    prices <- Gen.listOfN(n, Gen.choose(1, 6))
  } yield prices.zipWithIndex.map { case (p, i) =>
    TickerTick("K", new Timestamp(1700000000000L + i * 1000L), p.toFloat, 1)
  }

  test("imbalanceFold: chopped fold emits exactly the whole-series bar closes, any boundary") {
    for (seed <- 1L to 200L) {
      val series = sample(coarseSeriesGen, seed)
      val threshold = sample(Gen.choose(1L, 8L), seed + 1000)
      val (wholeState, whole) = StatefulOps.imbalanceFold(None, series, threshold)
      var st: Option[ImbalanceState] = None
      val emitted = List.newBuilder[ImbalanceEvent]
      chops(series, seed + 2000).foreach { batch =>
        val (s2, ev) = StatefulOps.imbalanceFold(st, batch, threshold)
        st = s2; emitted ++= ev
      }
      assert(emitted.result() === whole.toList, s"seed=$seed t=$threshold")
      assert(st === wholeState, s"seed=$seed t=$threshold")
      // every close carries |theta| >= threshold with the matching sign
      whole.foreach { e =>
        assert(math.abs(e.theta) >= threshold && e.direction == (if (e.theta > 0) 1 else -1),
          s"seed=$seed event=$e")
      }
    }
  }

  test("vpinFold: chopped fold emits exactly the whole-series buckets, any boundary") {
    for (seed <- 1L to 200L) {
      val series = sample(coarseSeriesGen, seed)
      val bucketTicks = 1 + sample(Gen.choose(0, 7), seed + 1000)
      val window = 1 + sample(Gen.choose(0, 4), seed + 1500)
      val (wholeState, whole) = StatefulOps.vpinFold(None, series, bucketTicks, window)
      var st: Option[VpinState] = None
      val emitted = List.newBuilder[VpinBucket]
      chops(series, seed + 2000).foreach { batch =>
        val (s2, b) = StatefulOps.vpinFold(st, batch, bucketTicks, window)
        st = s2; emitted ++= b
      }
      assert(emitted.result() === whole.toList, s"seed=$seed bt=$bucketTicks w=$window")
      assert(st === wholeState, s"seed=$seed")
      // every emitted bucket is exactly full and ids are dense from 0
      assert(whole.forall(_.n_ticks == bucketTicks), s"seed=$seed")
      assert(whole.map(_.bucket).toList === whole.indices.map(_.toLong).toList, s"seed=$seed")
    }
  }

  test("volumeBarFold invariants: tick/volume conservation, every closed bar >= threshold") {
    for (seed <- 1L to 200L) {
      val series = sample(seriesGen, seed)
      val thresholdMicros = sample(Gen.choose(1L, 40L), seed + 1000) * 1000000L
      val (st, closed) = StatefulOps.volumeBarFold(None, series, thresholdMicros)
      val all = closed ++ st.toList
      assert(all.map(_.nTicks).sum === series.size, s"seed=$seed")
      assert(all.map(_.volume).sum === series.map(_.volume.toLong).sum, s"seed=$seed")
      // a bar only closes because a later row's pre-cum left it, so its
      // volume reaches the threshold — EXCEPT a bar that was jumped
      // into mid-range by an oversized print (bar id advanced by >1):
      // such a bar holds the tail of the jump. Closed bars at id b
      // starting exactly at b*threshold must therefore be >= threshold
      // only when the NEXT bar is adjacent; the unconditional invariant
      // is on ids: closed bar ids strictly increase.
      assert(closed.map(_.bar) === closed.map(_.bar).sorted, s"seed=$seed")
      assert(closed.map(_.bar).distinct.size === closed.size, s"seed=$seed")
    }
  }

  test("kalmanFold: chopped fold reproduces the whole-series trajectory bit-exactly, any chops") {
    for (seed <- 1L to 200L) {
      val ticks = sample(seriesGen, seed)
      val (wholeState, wholePts) = StatefulOps.kalmanFold(None, ticks, 1.0, 10.0)
      val batches = chops(ticks, seed + 7000)
      var st: Option[StatefulOps.KalmanState] = None
      val pts = List.newBuilder[(TickerTick, Double, Double, Long)]
      batches.foreach { b =>
        val (s2, out) = StatefulOps.kalmanFold(st, b, 1.0, 10.0)
        st = s2
        pts ++= out
      }
      // bit-exact: the recurrence is pure IEEE arithmetic in fixed order
      assert(st === wholeState, s"seed=$seed state diverged")
      assert(pts.result() === wholePts, s"seed=$seed trajectory diverged")
      // gain is a deterministic, price-independent sequence converging
      // to the steady state: strictly decreasing after the seed row
      val gains = wholePts.map(_._3)
      if (gains.length > 2)
        assert(gains.tail.sliding(2).forall(w => w(1) <= w(0)), s"seed=$seed gain not decaying")
    }
  }

  test("zScoreFold: chopped fold emits exactly the whole-series events — integer state commutes") {
    for (seed <- 1L to 200L) {
      val ticks = sample(seriesGen, seed)
      val (wholeState, wholeEv) = StatefulOps.zScoreFold(None, ticks, 2.0, 3)
      val batches = chops(ticks, seed + 9000)
      var st: Option[StatefulOps.ZScoreState] = None
      val evs = List.newBuilder[StatefulOps.AnomalyEvent]
      batches.foreach { b =>
        val (s2, out) = StatefulOps.zScoreFold(st, b, 2.0, 3)
        st = s2
        evs ++= out
      }
      assert(st === wholeState, s"seed=$seed state diverged")
      assert(evs.result() === wholeEv, s"seed=$seed events diverged")
      // leakage-free: no event before minPrior observations exist
      assert(wholeEv.forall(_.n_prior >= 3), s"seed=$seed early event")
    }
  }

  test("zScoreFold: micro-sum overflow fails loudly instead of corrupting state (r11 advice)") {
    // a state one tick below Long overflow in s2Micro: the next fold
    // must throw (Math.addExact), never wrap silently
    val nearMax = StatefulOps.ZScoreState(10L, 0L, Long.MaxValue - 1L)
    val tick = TickerTick("T", new Timestamp(0L), 3000.0f, 1)
    intercept[ArithmeticException] {
      StatefulOps.zScoreFold(Some(nearMax), Seq(tick), 2.0, 3)
    }
  }

  test("nearDupEmit: min-(ts,id) predecessor within horizon, finality window respected") {
    import StatefulOps.nearDupEmit
    // entries: (ts, id). horizon 100. id 2 at 120 and ids 3/4 at 150 all
    // mark against the EARLIEST in-horizon predecessor (id 1 at 60), not
    // the nearest; id 9 at 400: its only predecessors are >100 away —
    // unmarked. Equal-ts ties order by id.
    val entries = Seq((60L, 1L), (120L, 2L), (150L, 3L), (150L, 4L), (400L, 9L))
    val all = nearDupEmit(entries, 100L, Long.MinValue, Long.MaxValue)
    assert(all === Seq((2L, 1L), (3L, 1L), (4L, 1L)), all.toString)
    // finality window: only entries with 130 <= ts < 160 emit
    assert(nearDupEmit(entries, 100L, 130L, 160L) === Seq((3L, 1L), (4L, 1L)))
    assert(nearDupEmit(entries, 100L, 160L, 500L) === Seq.empty,
      "id 9's predecessors are out of horizon — nothing emits in [160, 500)")
  }

  test("nearDupEmit: windowed emissions over ANY ascending watermark cuts tile the whole-series emission, any seed") {
    import StatefulOps.nearDupEmit
    // the watermark-complete property at the fold level: however the
    // watermark advances, concatenating the per-advance emission windows
    // reproduces the all-at-once emission exactly — entries are the
    // COMPLETE set in every call (the stream holds every possible
    // predecessor until eviction), only the finality window moves.
    for (seed <- 1L to 60L) {
      val n = sample(Gen.choose(0, 30), seed)
      val ts = sample(Gen.listOfN(n, Gen.choose(0L, 500L)), seed + 1)
      val entries = ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      val horizon = sample(Gen.choose(1L, 200L), seed + 2)
      val nCuts = sample(Gen.choose(0, 5), seed + 3)
      val cuts = sample(Gen.listOfN(nCuts, Gen.choose(0L, 600L)), seed + 4)
        .distinct.sorted
      val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
      val windowed = bounds.zip(bounds.tail).flatMap { case (from, until) =>
        nearDupEmit(entries, horizon, from, until)
      }
      val whole = nearDupEmit(entries, horizon, Long.MinValue, Long.MaxValue)
      assert(windowed.sorted === whole.sorted, s"seed=$seed diverged")
    }
  }

  test("nearDupVerdicts: exactly one verdict per distinct occurrence; repeated (ts, id) rows collapse (no self-mark)") {
    import StatefulOps.nearDupVerdicts
    // repeated occurrence: the r14-advice trap — a strict-tuple read over
    // the raw seq would find the identical tuple at a lower index and
    // report dup_of == doc_id; distinct-first makes the repeat invisible
    val dup = Seq((10L, 1L), (10L, 1L), (50L, 2L))
    val v = nearDupVerdicts(dup, 100L, Long.MinValue, Long.MaxValue)
    assert(v === Seq((10L, 1L, None), (50L, 2L, Some(1L))), v.toString)
    // property: over random entries, every DISTINCT occurrence gets
    // exactly one verdict, and the marked subset equals nearDupEmit
    for (seed <- 1L to 40L) {
      val n = sample(Gen.choose(0, 25), seed)
      val ts = sample(Gen.listOfN(n, Gen.choose(0L, 300L)), seed + 1)
      val entries = ts.zipWithIndex.map { case (t, i) => (t, (i % 7).toLong) }
      val horizon = sample(Gen.choose(1L, 150L), seed + 2)
      val verdicts = StatefulOps.nearDupVerdicts(
        entries, horizon, Long.MinValue, Long.MaxValue)
      assert(verdicts.map(x => (x._1, x._2)).sorted === entries.distinct.sorted,
        s"seed=$seed: one verdict per distinct occurrence")
      val marks = verdicts.collect { case (_, id, Some(p)) => (id, p) }
      assert(marks.sorted ===
        StatefulOps.nearDupEmit(entries, horizon, Long.MinValue, Long.MaxValue).sorted,
        s"seed=$seed: marked subset must equal nearDupEmit")
    }
  }
}
