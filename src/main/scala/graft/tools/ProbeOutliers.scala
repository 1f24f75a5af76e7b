package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-piece warm-wall attribution for the four per-twin bench outliers
  * the r14 verdict left undocumented (judge item 6): q222 (19×), q208
  * (16×), q209 (13×), q175 (11×) — each a sub-3-second Spark wall over
  * a sub-second DuckDB twin. The q213 treatment: rebuild each query's
  * pieces with the same pinning discipline and time them warm, so the
  * BENCH_NOTES table shows WHERE the wall lives (expected: the
  * deliberate ground-truth/exact side or a synthesized-corpus map
  * stage, not a fixable redundant build). Args: sfDir [iters]
  */
object ProbeOutliers {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "events", "embeddings").foreach { t =>
      val df = graft.Tables.load(spark, sfDir, t); df.cache(); df.count()
    }
    def timed[A](label: String)(f: => A): A = {
      var out: Option[A] = None
      (0 until iters).foreach { i =>
        val t0 = System.nanoTime()
        out = Some(f)
        println(f"[outlier] $label iter=$i wall=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
      out.get
    }

    // ---- q222: matryoshka structured report ------------------------
    {
      import graft.llmops.Similarity
      import graft.util.Partitioning.{stableRound6 => sr6}
      def mdU(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c), 1, 15), 16, 10)
          .cast("long").cast("double") / lit(1152921504606846976.0d)
      val vec = array((1 to 64).map { i =>
        (mdU(concat_ws(":", lit("mrl"), col("vec_id"), lit(i))) - lit(0.5)) /
          lit((1L << ((i - 1) / 8)).toDouble)
      }: _*)
      val emb = graft.Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id")).withColumn("embedding", vec)
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val c = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
      def topk(dim: Int): DataFrame = {
        val (qe, ne) =
          if (dim >= 64) (col("qe"), col("ne"))
          else (slice(col("qe"), 1, dim), slice(col("ne"), 1, dim))
        broadcast(q).join(c, col("qid") =!= col("nid"))
          .withColumn("__s", sr6(Similarity.cosine(qe, ne) + lit(0.0)))
          .withColumn("__rk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("__s").desc, col("nid"))))
          .filter(col("__rk") <= 10)
          .select("qid", "nid")
      }
      timed("q222_corpus_synth_only")(
        emb.agg(sum(element_at(col("embedding"), 1))).collect())
      val full = timed("q222_full64_topk")(topk(64).localCheckpoint(true))
      timed("q222_trunc32_leg")(
        full.join(topk(32), Seq("qid", "nid"), "left_semi").count())
      timed("q222_trunc16_leg")(
        full.join(topk(16), Seq("qid", "nid"), "left_semi").count())
    }

    // ---- q208 / q209: blocked-vs-full screen equivalence -----------
    {
      import graft.analytics.Pairs
      val d = timed("q208_close_frame")(
        graft.Tables.load(spark, sfDir, "lineitem")
          .filter(col("l_suppkey") <= 100)
          .withColumn("month", date_format(col("l_shipdate"), "yyyy-MM"))
          .groupBy(col("l_suppkey"), col("month"))
          .agg(max(col("l_extendedprice")).as("close"))
          .localCheckpoint(true))
      val blocks = timed("q208_blocks")(
        Pairs.blockedPairSource(d, "l_suppkey", "month", "close", bits = 3)
          .localCheckpoint(true))
      val fullCoint = timed("q208_FULL_coint_screen")(
        Pairs.cointegrationScreen(d, "l_suppkey", "month", "close")
          .localCheckpoint(true))
      timed("q208_blocked_coint_screen")(
        Pairs.cointegrationScreen(d, "l_suppkey", "month", "close", Some(blocks))
          .count())
      timed("q208_compare_join")(
        Pairs.cointegrationScreen(d, "l_suppkey", "month", "close", Some(blocks))
          .join(fullCoint.select(col("k1"), col("k2")), Seq("k1", "k2"))
          .count())
      val fullCcf = timed("q209_FULL_leadlag_screen")(
        Pairs.leadLagCorrelation(d, "l_suppkey", "month", "close", Seq(-1, 1))
          .localCheckpoint(true))
      timed("q209_blocked_leadlag_screen")(
        Pairs.leadLagCorrelation(d, "l_suppkey", "month", "close",
          Seq(-1, 1), Some(blocks)).count())
      println(s"[outlier] q208 frames: close=${d.count()} blocks=${blocks.count()} " +
        s"full_pairs=${fullCoint.count()} full_ccf=${fullCcf.count()}")
    }

    // ---- q175: research capstone prefix walls -----------------------
    {
      import graft.analytics.{Indicators, Labeling}
      val ticks = graft.Tables.load(spark, sfDir, "events")
        .filter(col("value") > 0)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val med = Indicators.rollingMedian(
        ticks, "value", "med21", Seq("user_id"), Seq("ts", "event_id"), 21)
      val fdf = Indicators.fracDiff(
        med, "value", "fd", Seq("user_id"), Seq("ts", "event_id"), d = 0.4, window = 10)
      val au = Labeling.averageUniqueness(
        fdf, "med21", Seq("user_id"), Seq("ts", "event_id"),
        horizon = 20, up = 0.25, down = 0.25)
      timed("q175_prefix_median")(med.count())
      timed("q175_prefix_median+fracdiff")(fdf.count())
      timed("q175_prefix_+uniqueness_labels")(au.count())
    }
    spark.stop()
  }
}
