package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for q129's pair-graph shape: edge count, component
  * count/size/diameter proxy (rounds to converge), and min-propagation
  * vs alternating CC wall time on the exact-cosine embedding graph.
  */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, sfDir, "embeddings").cache()
    emb.count()
    // phase view of the composed q129: uncached pairs feeding CC + join
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val freshPairs = graft.llmops.Dedup.embeddingNearDupPairs(
        emb, "vec_id", "embedding", minCosine = 0.4)
      val out = graft.llmops.Dedup.semanticDedupAssignments(emb, "vec_id", freshPairs)
      out.agg(count(lit(1))).collect()
      println(f"[probe] q129_composed iter$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val freshPairs = graft.llmops.Dedup.embeddingNearDupPairs(
        emb, "vec_id", "embedding", minCosine = 0.4)
      val edges = freshPairs.select(col("id_a"), col("id_b")).localCheckpoint()
      val comp = graft.llmops.Components.connectedComponentsJumping(edges, "id_a", "id_b")
        .select(col("id").as("vec_id"), col("label"))
      val rep = coalesce(col("label"), col("vec_id"))
      emb.select(col("vec_id")).join(comp, Seq("vec_id"), "left")
        .select(col("vec_id"), rep.as("rep_id"), (rep === col("vec_id")).as("kept"))
        .agg(count(lit(1))).collect()
      println(f"[probe] q129_jump_ckpt iter$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val freshPairs = graft.llmops.Dedup.embeddingNearDupPairs(
        emb, "vec_id", "embedding", minCosine = 0.4)
      val edges = freshPairs.select(col("id_a"), col("id_b")).localCheckpoint()
      val comp = graft.llmops.Components.connectedComponents(edges, "id_a", "id_b")
        .select(col("id").as("vec_id"), col("label"))
      val rep = coalesce(col("label"), col("vec_id"))
      emb.select(col("vec_id")).join(comp, Seq("vec_id"), "left")
        .select(col("vec_id"), rep.as("rep_id"), (rep === col("vec_id")).as("kept"))
        .agg(count(lit(1))).collect()
      println(f"[probe] q129_minprop_ckpt iter$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val freshPairs = graft.llmops.Dedup.embeddingNearDupPairs(
        emb, "vec_id", "embedding", minCosine = 0.4)
      graft.llmops.Components.connectedComponents(freshPairs, "id_a", "id_b")
        .agg(count(lit(1))).collect()
      println(f"[probe] cc_fresh_pairs iter$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val freshPairs = graft.llmops.Dedup.embeddingNearDupPairs(
        emb, "vec_id", "embedding", minCosine = 0.4)
      val fwd = freshPairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      println(f"[probe] bi_fresh iter$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // per-round breakdown: inlined min-propagation loop, fresh vs cached input
    def roundsProbe(tag: String, edges: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val fwd = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      val bi = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .localCheckpoint()
      println(f"[probe] $tag bi ${(System.nanoTime() - t0) / 1e9}%.3f s nparts=${bi.rdd.getNumPartitions}")
      var tc = System.nanoTime(); bi.count()
      println(f"[probe] $tag bi_count1 ${(System.nanoTime() - tc) / 1e9}%.3f s")
      tc = System.nanoTime(); bi.count()
      println(f"[probe] $tag bi_count2 ${(System.nanoTime() - tc) / 1e9}%.3f s")
      var t = System.nanoTime()
      var labels = bi.select(col("src").as("id"), col("dst"))
        .groupBy(col("id"))
        .agg(least(col("id"), min(col("dst"))).as("label"))
        .localCheckpoint(false)
      var prevSum = labels.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      println(f"[probe] $tag init ${(System.nanoTime() - t) / 1e9}%.3f s nparts=${labels.rdd.getNumPartitions}")
      var iter = 0; var converged = false
      while (iter < 25 && !converged) {
        t = System.nanoTime()
        val msgs = bi.join(labels, bi("src") === labels("id"))
          .select(bi("dst").as("id"), labels("label"))
        val next = labels.select(col("id"), col("label")).union(msgs)
          .groupBy(col("id")).agg(min(col("label")).as("label"))
          .localCheckpoint(false)
        val s = next.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
        converged = s == prevSum
        prevSum = s; labels = next; iter += 1
        println(f"[probe] $tag round$iter ${(System.nanoTime() - t) / 1e9}%.3f s")
      }
    }
    roundsProbe("fresh", graft.llmops.Dedup.embeddingNearDupPairs(
      emb, "vec_id", "embedding", minCosine = 0.4))
    roundsProbe("fresh_ckpt", graft.llmops.Dedup.embeddingNearDupPairs(
      emb, "vec_id", "embedding", minCosine = 0.4).localCheckpoint())
    val pairs = graft.llmops.Dedup.embeddingNearDupPairs(
      emb, "vec_id", "embedding", minCosine = 0.4).cache()
    println(s"[probe] pairs=${pairs.count()}")
    roundsProbe("cached", pairs)

    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[probe] $tag iter$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("minprop") {
      graft.llmops.Components.connectedComponents(pairs, "id_a", "id_b")
        .agg(count(lit(1)), countDistinct(col("label"))).collect()
    }
    time("alternating") {
      graft.llmops.Components.connectedComponentsAlternating(pairs, "id_a", "id_b")
        .agg(count(lit(1)), countDistinct(col("label"))).collect()
    }
    time("jumping") {
      graft.llmops.Components.connectedComponentsJumping(pairs, "id_a", "id_b")
        .agg(count(lit(1)), countDistinct(col("label"))).collect()
    }
    // output identity: jumping must equal min-propagation exactly
    val a = graft.llmops.Components.connectedComponents(pairs, "id_a", "id_b")
    val b = graft.llmops.Components.connectedComponentsJumping(pairs, "id_a", "id_b")
    println(s"[probe] jump_diff=${a.exceptAll(b).count() + b.exceptAll(a).count()}")
    // q72's minhash graph for the comparison row
    val docs = graft.Tables.load(spark, sfDir, "documents").cache()
    docs.count()
    val mh = graft.llmops.Dedup.minhashCandidatePairs(docs, "doc_id", "text").cache()
    println(s"[probe] mh_pairs=${mh.count()}")
    time("mh_minprop") {
      graft.llmops.Components.connectedComponents(mh, "doc_a", "doc_b")
        .agg(count(lit(1)), countDistinct(col("label"))).collect()
    }
    time("mh_jumping") {
      graft.llmops.Components.connectedComponentsJumping(mh, "doc_a", "doc_b")
        .agg(count(lit(1)), countDistinct(col("label"))).collect()
    }
    val c = graft.llmops.Components.connectedComponents(mh, "doc_a", "doc_b")
    val d = graft.llmops.Components.connectedComponentsJumping(mh, "doc_a", "doc_b")
    println(s"[probe] mh_jump_diff=${c.exceptAll(d).count() + d.exceptAll(c).count()}")
    val comp = graft.llmops.Components.connectedComponents(pairs, "id_a", "id_b")
    val sizes = comp.groupBy("label").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_comps"), max(col("n")).as("max_size")).collect()(0)
    println(s"[probe] n_comps=${sizes.get(0)} max_size=${sizes.get(1)}")
    spark.stop()
  }
}
