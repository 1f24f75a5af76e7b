package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures X98's staleness report on BOTH sides of its contract
  * (q237 pins the quiet side; this probe shows the loud one):
  *
  *   1. same-distribution increment (the q237 fixture) — must NOT fire;
  *   2. a SHIFTED increment (every extension vector displaced by a
  *      constant offset — the "new content region" scenario a frozen
  *      centroid set cannot describe) — must fire `refit_due`.
  *
  * Prints both verdict rows; the numbers land in docs/BENCH_NOTES.md
  * as the refit-policy evidence.
  */
object ProbeAnnDrift {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llmops.{AnnIndex, Similarity}
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val inc = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    def run(tag: String, increment: org.apache.spark.sql.DataFrame): Unit = {
      val path = java.nio.file.Files.createTempDirectory(s"ann_drift_$tag").toString
      AnnIndex.fitIvfIndex(base, "vec_id", "embedding", 64, nCells = 16, path)
      val v = AnnIndex.assignmentsVersion(path)
      AnnIndex.extendIvfIndex(increment, "vec_id", "embedding", path)
      val r = AnnIndex.stalenessReport(spark, path, v).collect()(0)
      println(s"[ann_drift] $tag n_base=${r.getAs[Long]("n_base")} " +
        s"n_now=${r.getAs[Long]("n_now")} psi=${r.getAs[Double]("psi")} " +
        s"mean_sim_base=${r.getAs[Double]("mean_sim_base")} " +
        s"mean_sim_now=${r.getAs[Double]("mean_sim_now")} " +
        s"psi_ok=${r.getAs[Boolean]("psi_ok")} sim_ok=${r.getAs[Boolean]("sim_ok")} " +
        s"refit_due=${r.getAs[Boolean]("refit_due")}")
    }
    run("same_dist", inc)
    // the drifted increment: a constant displacement of +4.0 on the
    // first 16 dimensions — a new content region the fitted centroids
    // never described: all increment mass funnels into the few cells
    // whose centroids lean that way, so the POPULATION PSI axis fires
    // (measured 0.32 > 0.25; the mean-sim axis alone would miss this —
    // displaced vectors can sit no farther from their best centroid)
    val shifted = inc.select(col("vec_id"),
      expr("transform(embedding, (x, i) -> CASE WHEN i < 16 THEN CAST(x + 4.0 AS FLOAT) ELSE x END)")
        .as("embedding"))
    run("shifted", shifted)
    spark.stop()
  }
}
