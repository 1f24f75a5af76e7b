package graft

import graft.analytics.Labeling

class LabelingSpec extends SparkSpec {
  import spark.implicits._

  test("tripleBarrierLabels: first touch wins, vertical barrier is 0/null, truncated tail ok") {
    val rows = Seq(
      (1L, "u", 100.0), (2L, "u", 110.0), (3L, "u", 130.0),
      (4L, "u", 70.0), (5L, "u", 100.0)
    ).toDF("seq", "uid", "v")
    val out = Labeling.tripleBarrierLabels(
        rows, "v", Seq("uid"), Seq("seq"), horizon = 3, up = 0.25, down = 0.25)
      .collect().map(r => r.getLong(0) -> r).toMap
    // v=100, fwd [110,130,70]: up 125 touched at pos 2 BEFORE down 75 at pos 3
    assert(out(1L).getAs[Int]("label") === 1)
    assert(out(1L).getAs[Long]("t_touch") === 2L)
    // v=110, fwd [130,70,100]: up 137.5 never, down 82.5 at pos 2
    assert(out(2L).getAs[Int]("label") === -1)
    assert(out(2L).getAs[Long]("t_touch") === 2L)
    // v=130, truncated fwd [70,100]: down 97.5 at pos 1
    assert(out(3L).getAs[Int]("label") === -1)
    assert(out(3L).getAs[Long]("t_touch") === 1L)
    // v=70, fwd [100]: up 87.5 at pos 1
    assert(out(4L).getAs[Int]("label") === 1)
    assert(out(4L).getAs[Long]("t_touch") === 1L)
    // last row: empty forward window -> vertical barrier
    assert(out(5L).getAs[Int]("label") === 0)
    assert(out(5L).isNullAt(out(5L).fieldIndex("t_touch")))
  }

  test("tripleBarrierLabels: null forward values occupy their window slot as non-touches") {
    // collect_list would silently drop the null and shift the touch from
    // position 2 to 1 — the struct-carried window must keep it in place
    val rows = Seq(
      (1L, "u", Some(100.0)), (2L, "u", Option.empty[Double]), (3L, "u", Some(130.0))
    ).toDF("seq", "uid", "v")
    val out = Labeling.tripleBarrierLabels(
        rows, "v", Seq("uid"), Seq("seq"), horizon = 2, up = 0.25, down = 0.25)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("label") === 1)
    assert(out(1L).getAs[Long]("t_touch") === 2L)   // 130 sits at slot 2, not 1
    assert(out(2L).getAs[Int]("label") === 0)       // null own value: no barriers
  }

  test("averageUniqueness: mean reciprocal concurrency over each span; last row null") {
    // flat series, horizon 2, wide barriers -> no touches; spans:
    // L1=2 (covers rows 2,3), L2=2 (3,4), L3=1 (4), L4=0.
    // coverage: c2=1, c3=2, c4=2 -> u1=(1+1/2)/2=0.75, u2=0.5, u3=0.5
    val rows = (1 to 4).map(i => (i.toLong, "u", 10.0)).toDF("seq", "uid", "v")
    val out = Labeling.averageUniqueness(
        rows, "v", Seq("uid"), Seq("seq"), horizon = 2, up = 0.5, down = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("label_span") === 2L)
    assert(out(1L).getAs[Double]("uniqueness") === 0.75)
    assert(out(2L).getAs[Double]("uniqueness") === 0.5)
    assert(out(3L).getAs[Long]("label_span") === 1L)
    assert(out(3L).getAs[Double]("uniqueness") === 0.5)
    assert(out(4L).getAs[Long]("label_span") === 0L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("uniqueness")))
    // an isolated event (its own user) is fully unique
    val solo = Seq((1L, "s", 10.0), (2L, "s", 10.0)).toDF("seq", "uid", "v")
    val u = Labeling.averageUniqueness(solo, "v", Seq("uid"), Seq("seq"), 2, 0.5, 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(u(1L).getAs[Double]("uniqueness") === 1.0)
  }

  test("tripleBarrierLabels: flat series never touches; labels deterministic under repartition") {
    val rows = (1 to 50).map(i => (i.toLong, "u", 100.0)).toDF("seq", "uid", "v")
    val out = Labeling.tripleBarrierLabels(
        rows, "v", Seq("uid"), Seq("seq"), horizon = 10, up = 0.01, down = 0.01)
      .collect()
    assert(out.forall(_.getAs[Int]("label") === 0))
    val again = Labeling.tripleBarrierLabels(
        rows.repartition(7), "v", Seq("uid"), Seq("seq"), 10, 0.01, 0.01)
      .collect().map(r => (r.getLong(0), r.getInt(out.head.fieldIndex("label")))).toSet
    assert(again === out.map(r => (r.getLong(0), r.getAs[Int]("label"))).toSet)
  }
}
