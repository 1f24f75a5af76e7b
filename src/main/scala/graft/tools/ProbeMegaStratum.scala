package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 judge item 3's decade evidence: capPerStratum on a MEGA-STRATUM
  * fixture (one stratum holds 90% of the corpus) at n and 10n — the
  * exact skew shape whose whole population the old full-stratum rank
  * window sorted through ONE task. The bounded-heap form must scale
  * ~linearly (decade exponent ≈ 1, i.e. exp10 ≈ 1.0 on wall time; the
  * window form degrades toward the single-task sort). Emits both
  * fixture sizes' wall times and the exponent; lands in BENCH_NOTES.
  */
object ProbeMegaStratum {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect() // warm
    def fixture(n: Long) = spark.range(n).select(
      when(col("id") % 10 =!= 0, lit("mega")).otherwise(concat(lit("s"), col("id") % 1000)).as("s"),
      col("id"),
      (col("id") % 9973).cast("double").as("p"))
      .repartition(32).localCheckpoint(true) // pin the input off the lineage
    def time(n: Long): Double = {
      val df = fixture(n)
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val kept = graft.llmops.Sampling.capPerStratum(df, "s", "id", col("p"), cap = 50)
          .filter(col("kept")).count()
        require(kept > 0)
        (System.nanoTime() - t0) / 1e9
      }.min
      df.unpersist()
      t
    }
    val small = 2000000L
    val a = time(small)
    val b = time(small * 10)
    println(f"[mega_stratum] n=$small t=$a%.3f s; n=${small * 10} t=$b%.3f s; " +
      f"exp10=${math.log10(b / a)}%.3f (90%% of rows in one stratum, cap=50)")
    spark.stop()
  }
}
