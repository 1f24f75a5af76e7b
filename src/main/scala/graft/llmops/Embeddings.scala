package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Partitioning.{stableRound6 => sr6}

/** Labeled-embedding quality diagnostics — the "are these classes
  * actually separable in this space" report an embedding pipeline runs
  * before committing to an ANN index layout or a classifier head.
  */
object Embeddings {

  /** Centroid-based (simplified) SILHOUETTE per label: each vector's
    * Euclidean distance `a` to its own label centroid vs `b` to the
    * nearest OTHER centroid, s = (b − a)/max(a, b); per label the mean
    * s, plus `n_misassigned` — vectors strictly closer to a foreign
    * centroid (the k-means-style confusion count). The centroid form is
    * the O(n·k) member of the silhouette family (the classical pairwise
    * form is O(n²) — unusable at corpus scale and needlessly precise
    * for a health report).
    *
    * Determinism: centroids are per-dimension means FLOORED at 1e-6
    * before any distance math — both engines then fold identical
    * doubles left-to-right (the q24/q82 list_sum contract), so a/b are
    * bit-identical and the `b < a` comparison is exact.
    *
    * Scale shape: one (label, dim) hash aggregate builds the centroids
    * (|labels|·d rows), which collect driver-side under a byte budget
    * and re-enter the plan as LITERAL arrays — the corpus itself is
    * scanned ONCE with a map-only codegen projection (distances via
    * zip_with/aggregate against the literals), then one |labels|-row
    * aggregate. No join, no shuffle beyond the two aggregates.
    */
  def classSeparation(
      df: DataFrame, vecCol: String, labelCol: String,
      maxCentroidBytes: Long = 16L << 20): DataFrame = {
    val cent = df
      .select(col(labelCol).as("__lab"),
        posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col("__lab"), col("__pos"))
      .agg(sr6(avg(col("__v").cast("double"))).as("__c"))
    val rows = cent.groupBy(col("__lab"))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__c")))).as("__s"))
      .select(col("__lab"), transform(col("__s"), _.getField("__c")).as("__cv"))
      .collect()
    // label read GENERICALLY: the API contract is (DataFrame, String) for
    // any equality-comparable label column — r.getInt would throw a raw
    // ClassCastException on long/string labels (r11 advice). The sort is
    // only for deterministic literal-array order in the plan, so the
    // string rendering is a fine total order for any label type.
    val centroids: Seq[(Any, Seq[Double])] =
      rows.map(r => r.get(0) -> r.getSeq[Double](1)).toSeq.sortBy(_._1.toString)
    require(centroids.nonEmpty, "classSeparation: no labeled vectors")
    val bytes = centroids.map(_._2.length.toLong * 8L).sum
    require(bytes <= maxCentroidBytes,
      s"classSeparation: centroid matrix is $bytes bytes > $maxCentroidBytes. " +
        "That many labels/dimensions wants the join form — aggregate " +
        "centroids to a table and broadcast-join instead of plan literals.")
    val distStructs = centroids.map { case (lab, cv) =>
      val litArr = array(cv.map(lit): _*)
      val d2 = aggregate(
        zip_with(col(vecCol), litArr, (x, c) => {
          val d = x.cast("double") - c; d * d
        }),
        lit(0.0), _ + _)
      struct(lit(lab).as("lab"), sqrt(d2).as("dist"))
    }
    val arr = array(distStructs: _*)
    val own = element_at(
      filter(arr, s => s.getField("lab") === col(labelCol)), 1).getField("dist")
    val other = array_min(
      transform(filter(arr, s => s.getField("lab") =!= col(labelCol)),
        _.getField("dist")))
    val a = col("__a"); val b = col("__b")
    df.withColumn("__a", own).withColumn("__b", other)
      .withColumn("__sil",
        when(b.isNull, lit(null).cast("double")) // single-label corpus
          .when(greatest(a, b) === 0.0, lit(0.0))
          .otherwise((b - a) / greatest(a, b)))
      .groupBy(col(labelCol))
      .agg(
        count(lit(1)).as("n"),
        sr6(avg(col("__sil")) + lit(0.0)).as("silhouette"),
        sum((b < a).cast("long")).as("n_misassigned"))
  }
}
