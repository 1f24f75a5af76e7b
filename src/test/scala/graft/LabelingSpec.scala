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
