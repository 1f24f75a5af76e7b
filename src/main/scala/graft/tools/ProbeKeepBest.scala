package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the window vs argmax-aggregate forms of canonical
  * selection ([[graft.llmops.Components.keepBestPerComponent]] vs
  * [[graft.llmops.Components.keepBestPerComponentAggregated]]) in the
  * two regimes the scaladoc names:
  *
  *   - realistic: many small clusters (the near-dup shape LSH produces
  *     on normal corpora) — the window's single shuffle should win;
  *   - adversarial skew: ONE star-shaped giant cluster holding half
  *     the universe (the boilerplate-corpus shape) — the window sorts
  *     the whole cluster through one task, the aggregate collapses it
  *     map-side.
  *
  * Args: [giantSize] [iters]. Both forms share the same CC cost (same
  * pair graph), so the delta isolates the selection stage.
  */
object ProbeKeepBest {
  def main(args: Array[String]): Unit = {
    val giant = args.lift(0).map(_.toInt).getOrElse(2000000)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    import graft.llmops.Components

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[keepbest] $label: ${ts.map(t => f"${t._1}%.3f").mkString(" ")} " +
        f"min=${ts.map(_._1).min}%.3f (kept=${ts.head._2})")
    }

    // shared universe: 2*giant ids, hash-derived score
    val docs = spark.range(2L * giant).select(
      col("id").as("doc_id"),
      (xxhash64(col("id")) % 1000).cast("double").as("score"))
      .localCheckpoint()

    // realistic: giant/5 clusters of ~5 docs each over the first half
    val small = spark.range(giant).select(
        col("id").as("doc_a"),
        (col("id") - pmod(col("id"), lit(5L))).as("doc_b")) // integer cluster rep
      .filter(col("doc_a") =!= col("doc_b")).localCheckpoint()
    // adversarial: one star centered at 0 spanning the first half
    val star = spark.range(1, giant).select(
      lit(0L).as("doc_a"), col("id").as("doc_b")).localCheckpoint()

    for ((name, pairs) <- Seq(("many-small", small), ("one-giant-star", star))) {
      time(s"$name window") {
        Components.keepBestPerComponent(
          docs, pairs, "doc_id", "doc_a", "doc_b", col("score"))
          .filter(col("kept")).count()
      }
      time(s"$name aggregated") {
        Components.keepBestPerComponentAggregated(
          docs, pairs, "doc_id", "doc_a", "doc_b", col("score"))
          .filter(col("kept")).count()
      }
    }
    spark.stop()
  }
}
