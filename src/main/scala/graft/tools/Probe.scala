package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (contents rotate per investigation — see git history).
  * Current (r19): does the CC fixpoint's per-round cost track the
  * shuffle width? q129/q72 run their label-propagation rounds over a
  * ~10k-node graph at spark.sql.shuffle.partitions tasks per stage —
  * compare the same queries at widths 32 / 8 / 1.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val width = args.headOption.getOrElse("32")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q239_recon_stream", "q229_late_lanes")) {
      val fn = graft.SparkEntry.queries(q)
      val times = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] width=$width $q: ${times.map(t => f"$t%.2f").mkString(" ")} min=${times.min}%.2f")
    }
    spark.stop()
  }
}
