package graft

import org.apache.spark.sql.functions._

import graft.analytics.Validation

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("purgedTimeFolds: boundary rows are purged, counts balance per fold") {
    // 10 rows, one per day; k=2 cuts at day 5, embargo = 1 day.
    // fold0 = days 0-4, fold1 = days 5-9; day 4 is within the embargo
    // BEFORE the cut (purged when fold1 tests), day 5 within the embargo
    // AFTER it (purged when fold0 tests).
    val rows = (0 until 10).map { d =>
      (d.toLong, ts(f"2024-01-${d + 1}%02d 12:00:00"))
    }.toDF("id", "t")
    val out = Validation.purgedTimeFolds(rows, "t", k = 2, embargoSeconds = 86400L)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.size === 2)
    assert(out(0).getAs[Long]("n_test") === 5)
    assert(out(0).getAs[Long]("n_purged") === 1)   // day 5
    assert(out(0).getAs[Long]("n_train") === 4)
    assert(out(1).getAs[Long]("n_test") === 5)
    assert(out(1).getAs[Long]("n_purged") === 1)   // day 4
    assert(out(1).getAs[Long]("n_train") === 4)
  }

  test("purgedTimeFolds: embargo wider than a fold fails in-plan with the remedy") {
    val rows = (0 until 10).map { d =>
      (d.toLong, ts(f"2024-01-${d + 1}%02d 12:00:00"))
    }.toDF("id", "t")
    val e = intercept[Exception] {
      Validation.purgedTimeFolds(rows, "t", k = 5, embargoSeconds = 3L * 86400L)
        .collect()
    }
    // the guard evaluates on the broadcast side — walk the cause chain so
    // a wrapping exchange exception cannot hide the message
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(msgs.contains("embargo"), msgs)
    assert(msgs.contains("fewer folds"), msgs)
  }

  test("walkForwardFolds: train is everything before minus the embargo tail; slice 0 never tests") {
    // same 10-day/k=2 series as the purged test: fold 1 tests days 5-9,
    // trains days 0-3 (day 4 sits in the 1-day embargo tail of slice 0)
    val rows = (0 until 10).map { d =>
      (d.toLong, ts(f"2024-01-${d + 1}%02d 12:00:00"))
    }.toDF("id", "t")
    val out = Validation.walkForwardFolds(rows, "t", k = 2, embargoSeconds = 86400L)
      .collect()
    assert(out.length === 1)                       // k-1 rows: slice 0 only trains
    assert(out.head.getInt(0) === 1)
    assert(out.head.getAs[Long]("n_test") === 5)
    assert(out.head.getAs[Long]("n_purged") === 1) // day 4
    assert(out.head.getAs[Long]("n_train") === 4)  // days 0-3
  }

  test("walkForwardFolds: expanding trains on harness events, accounts balance") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val out = Validation.walkForwardFolds(ev, "ts", k = 5, embargoSeconds = 86400L)
      .collect().sortBy(_.getInt(0))
    assert(out.length === 4)
    // train + purge = all rows strictly before the test slice → the
    // (train+purge+running tests) sequence is the cumulative row count
    val total = ev.count()
    val nTests = out.map(_.getAs[Long]("n_test"))
    val slice0 = total - nTests.sum // the never-tested first slice
    val cums = nTests.scanLeft(slice0)(_ + _)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_purged") === cums(i),
        s"fold ${r.getInt(0)}: $r")
      assert(r.getAs[Long]("n_purged") >= 0)
    }
    // trains expand monotonically (modulo the per-fold embargo tail,
    // bounded by one slice) — the anchored-window property
    val trains = out.map(_.getAs[Long]("n_train"))
    assert(trains.zip(trains.tail).forall { case (a, b) => b > a },
      trains.mkString(","))
  }

  test("purgedTimeFolds: invariants on harness events (sums balance, purging active)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val total = ev.count()
    val out = Validation.purgedTimeFolds(ev, "ts", k = 5, embargoSeconds = 86400L)
      .collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Long]("n_test")).sum === total)
    out.foreach { r =>
      assert(r.getAs[Long]("n_test") + r.getAs[Long]("n_purged") +
        r.getAs[Long]("n_train") === total, r.toString)
      assert(r.getAs[Long]("n_purged") >= 0, r.toString)
    }
    // a 1-day embargo over a continuous month of events must purge SOMETHING
    assert(out.map(_.getAs[Long]("n_purged")).sum > 0)
    // determinism across repartition: fate is arithmetic, not layout
    val again = Validation.purgedTimeFolds(ev.repartition(7), "ts", 5, 86400L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(again === out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
  }
}
