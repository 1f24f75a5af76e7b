package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.Microstructure
import graft.streaming.StatefulOps._

/** Ties the streaming VPIN recurrence to the batch window-algebra form:
  * the two are different EXPRESSIBILITY classes (state fold vs
  * last-ignoreNulls gap-fill + frames) computing one contract, so their
  * completed buckets must agree field-for-field.
  */
class VpinParitySpec extends graft.SparkSpec {
  import spark.implicits._

  test("vpinStream's fold == batch vpin on completed buckets") {
    // deterministic pseudo-random coarse prices: repeats exercise the
    // sign carry; 47 ticks at bucketTicks=10 leave a partial 7-tick
    // bucket that the stream holds in state and the batch form reports
    val prices = (0 until 47).map(i => ((i * 13) % 7 + 1).toDouble)
    val ticks = prices.zipWithIndex.map { case (p, i) =>
      TickerTick("A", new Timestamp(1700000000000L + i * 1000L), p.toFloat, 1)
    }
    val (_, streamed) = StatefulOps.vpinFold(None, ticks, bucketTicks = 10, window = 3)
    val df = prices.zipWithIndex.map { case (p, i) => ("A", i.toLong, p) }
      .toDF("sym", "seq", "px")
    val batch = Microstructure.vpin(df, "sym", Seq("seq"), "px", 10, 3)
      .orderBy("bucket").collect()
    assert(batch.length === 5 && streamed.length === 4) // 4 full + 1 partial
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.bucket === b.getAs[Long]("bucket"))
      assert(s.n_ticks === b.getAs[Long]("n_ticks"))
      assert(s.net === b.getAs[Long]("net"))
      assert(s.vpin === b.getAs[Double]("vpin"))
      assert(s.vpin_roll === b.getAs[Double]("vpin_roll"))
    }
  }
}
