package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe (contents rotate per investigation — see git history).
  * Current: q213 stage attribution — where do the ~2.7 isolated seconds
  * go between the close-frame build, the ground-truth full DF screen,
  * the blocked source, and the config aggregates?
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    val dir = "/root/testdata/sf0.1"
    Seq("supplier").foreach { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet"); df.cache(); df.count()
    }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { it =>
      println(s"--- iter $it ---")
      import graft.analytics.Pairs
      val keys = spark.read.parquet(s"$dir/supplier.parquet")
        .filter(col("s_suppkey") <= 100)
        .select(col("s_suppkey").cast("long").as("k"))
      val grid = keys.crossJoin(
        spark.range(1, 49).select(col("id").cast("int").as("m")))
      def mdU(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        conv(substring(md5(c), 1, 15), 16, 10)
          .cast("long").cast("double") / lit(1152921504606846976.0d)
      val inc = floor((mdU(concat_ws(":", lit("f"), col("k") % 10, col("m"))) - lit(0.5))
        * lit(1000000.0) + lit(0.5)).cast("long")
      val idio = floor((mdU(concat_ws(":", lit("e"), col("k"), col("m"))) - lit(0.5))
        * lit(200000.0) + lit(0.5)).cast("long")
      val wCum = Window.partitionBy(col("k")).orderBy(col("m"))
      val d = t("d build+ckpt") {
        grid
          .withColumn("__fac", sum(inc).over(wCum))
          .withColumn("close",
            lit(100.0) + (col("__fac") + idio).cast("double") / lit(1000000.0))
          .withColumn("month", format_string("m%02d", col("m")))
          .select(col("k"), col("month"), col("close"))
          .localCheckpoint(true)
      }
      val full = Pairs.dickeyFullerScreen(d, "k", "month", "close")
      val topk = t("full DF screen + topk + ckpt") {
        full.filter(col("df_tstat").isNotNull)
          .withColumn("__rk", row_number().over(
            Window.orderBy(abs(col("df_tstat")).desc, col("k1"), col("k2"))))
          .filter(col("__rk") <= 20)
          .select("k1", "k2")
          .localCheckpoint(true)
      }
      val bl3 = t("bl3 build+ckpt") {
        Pairs.blockedPairSource(d, "k", "month", "close", bits = 3, tables = 3)
          .localCheckpoint(true)
      }
      val cand = t("cand one-pass+ckpt") {
        bl3.select(col("k").as("k1"), col("pair_table"), col("pair_block"))
          .join(bl3.select(col("k").as("k2"), col("pair_table"), col("pair_block")),
            Seq("pair_table", "pair_block"))
          .filter(col("k1") < col("k2"))
          .groupBy(col("k1"), col("k2"))
          .agg(max((col("pair_table") === 0).cast("long")).as("__t0"))
          .localCheckpoint(true)
      }
      t("final aggregates") {
        val nC = cand.agg(count(lit(1)).as("c3"), sum(col("__t0")).as("c1"))
        val sv = topk.join(cand, Seq("k1", "k2"))
          .agg(count(lit(1)).as("s3"),
            coalesce(sum(col("__t0")), lit(0L)).as("s1"))
        nC.crossJoin(sv).collect()(0)
      }
    }
    spark.stop()
  }
}
