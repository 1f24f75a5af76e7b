package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 scale-decade generator (r9 verdict item 3): build a FACTOR× slice
  * of the three engine-native tables (`events`, `documents`,
  * `embeddings`) from sf0.1, leaving the TPC-H tables symlinked at
  * sf0.1 (per the verdict: the decade extension targets the
  * llmops/analytics surface). Output is ephemeral (/tmp) — regenerate
  * with this tool; ProbeScaling10 consumes it.
  *
  * Replication is STRUCTURE-PRESERVING, not row-copying — each replica
  * r ∈ [0, factor) is keyed away from the others so per-key work scales
  * linearly instead of quadratically:
  *
  *   - events: event_id/user_id offset per replica (10× users, per-user
  *     series length UNCHANGED — window/sessionization state per key is
  *     constant), ts/event_type/value/props untouched so calendar
  *     windows get 10× density, the aggregation scale axis.
  *   - documents: doc_id offset; text passed through a PER-REPLICA
  *     Caesar cipher (`translate` over a rotated alphabet) for r>0 —
  *     length-preserving and bijective, so WITHIN-replica
  *     shingle/minhash/simhash similarity structure is preserved
  *     (near-dup pairs, dup groups, containment pairs scale ≈×factor)
  *     while CROSS-replica character shingles all differ (Jaccard 0).
  *     The first cut suffixed each word with `x<r>` instead; that
  *     leaves within-word 8-char shingles intact, cross-replica
  *     Jaccard lands ~0.3+, and LSH candidate pairs measured 59× at
  *     factor 10 — a quadratic-ish blow-up no real 10× corpus has,
  *     same failure mode as replicating verbatim (every doc a 10-way
  *     exact dup).
  *   - embeddings: vec_id offset; dimensions circularly rotated by r
  *     (norms and within-replica pairwise dots exactly preserved;
  *     cross-replica dots decorrelate), labels untouched.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // the text cipher is a rotation of the 26-letter alphabet: replica
    // r and replica r+26 would get IDENTICAL ciphers, making 4/30ths of
    // a factor-30 corpus exact cross-replica duplicates — precisely the
    // blow-up the cipher exists to avoid. Fail loudly at the boundary.
    require(factor >= 1 && factor <= 26,
      s"factor must be in [1, 26] (alphabet rotation wraps at 26), got $factor")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Paths.get(outDir)
    if (java.nio.file.Files.exists(out)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(out)
      try walk.iterator().asScala.toSeq.reverse.foreach(p =>
        java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    java.nio.file.Files.createDirectories(out)

    // TPC-H tables stay at sf0.1 — symlink the single-file parquets
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      java.nio.file.Files.createSymbolicLink(
        out.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"$srcDir/$t.parquet"))
    }

    def withReplica(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("r", explode(array((0 until factor).map(lit(_)): _*)))

    val ev = graft.Tables.load(spark, srcDir, "events")
    val Array(maxE, maxU) = ev.agg(max(col("event_id")), max(col("user_id")))
      .collect()(0).toSeq.map(_.asInstanceOf[Long] + 1L).toArray
    withReplica(ev).select(
        (col("event_id") + col("r") * lit(maxE)).as("event_id"), col("ts"),
        (col("user_id") + col("r") * lit(maxU)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.parquet(s"$outDir/events.parquet")

    val docs = graft.Tables.load(spark, srcDir, "documents")
    val maxD = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rot(s: String, r: Int) = s.drop(r % 26) + s.take(r % 26)
    val ciphered = (1 until factor).foldLeft(
        when(col("r") === 0, col("text"))) { (acc, r) =>
      acc.when(col("r") === r,
        translate(col("text"), lower + upper, rot(lower, r) + rot(upper, r)))
    }.otherwise(col("text"))
    withReplica(docs).select(
        (col("doc_id") + col("r") * lit(maxD)).as("doc_id"),
        ciphered.as("text"),
        col("lang"), col("source"), col("n_chars")) // cipher is length-preserving
      .repartition(32)
      .write.parquet(s"$outDir/documents.parquet")

    val emb = graft.Tables.load(spark, srcDir, "embeddings")
    val maxV = emb.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    withReplica(emb).select(
        (col("vec_id") + col("r") * lit(maxV)).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          concat(slice(col("embedding"), col("r") + 1, lit(dim) - col("r")),
            slice(col("embedding"), lit(1), col("r")))).as("embedding"),
        col("label"))
      .repartition(32)
      .write.parquet(s"$outDir/embeddings.parquet")

    for (t <- Seq("events", "documents", "embeddings")) {
      val n = spark.read.parquet(s"$outDir/$t.parquet").count()
      println(s"[genscale] $t: $n rows")
    }
    spark.stop()
  }
}
