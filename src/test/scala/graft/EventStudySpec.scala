package graft

import org.apache.spark.sql.functions._

import graft.analytics.EventStudy

class EventStudySpec extends SparkSpec {
  import spark.implicits._

  test("carDaily: hand-computed abnormal moves; first day excluded; anchorless entity null") {
    val events = Seq(
      // (user, day-ts, value, type). Daily sums: A: 10, 14, 13; B: 20, 21, 24
      (1L, "2024-01-01 10:00:00", 10.0, "view"),
      (1L, "2024-01-02 10:00:00", 14.0, "purchase"), // anchor day for A
      (1L, "2024-01-03 10:00:00", 13.0, "view"),
      (2L, "2024-01-01 10:00:00", 20.0, "view"),
      (2L, "2024-01-02 10:00:00", 21.0, "view"),
      (2L, "2024-01-03 10:00:00", 24.0, "view")
    ).toDF("user_id", "ts0", "value", "event_type")
      .withColumn("ts", to_timestamp(col("ts0")))
    // r: A (null, 4, -1), B (null, 1, 3); mkt: (null, 2.5, 1)
    // ar: A (null, 1.5, -2), B (null, -1.5, 2)
    // CAR(0..3) at A's anchor day2: 1.5 + (-2) = -0.5
    val out = EventStudy.carDaily(events, "user_id", "ts", "value",
      anchor = col("event_type") === "purchase", horizonDays = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = out(1L)
    assert(a.getAs[Long]("n_events") === 1L)
    assert(a.getAs[Double]("mean_car") === -0.5)
    assert(a.getAs[Double]("mean_ar0") === 1.5)
    val b = out(2L)
    assert(b.getAs[Long]("n_events") === 0L)
    assert(b.isNullAt(b.fieldIndex("mean_car"))) // nothing to average
  }
}
