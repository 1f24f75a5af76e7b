package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.Similarity

/** r10 probe: phase-level timing of q112 (PQ train / ADC+rerank / exact
  * twin / verdict join) across repeated in-JVM iterations, to attribute
  * the closing-artifact variance (1.19 s .. 3.26 s across idle full-bench
  * runs on identical data) to a phase rather than to "context".
  */
object ProbePqPhases {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(100000).selectExpr("sum(id)").collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.cache(); emb.count()
    def ms[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (i <- 1 to iters) {
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), Similarity.asDouble(col("embedding")).as("qv"))
      val ((codebook, codes), tTrain) = ms {
        val r = Similarity.pqIndex(emb, "vec_id", "embedding", 64, m = 16, ksub = 16, lloydIters = 2)
        r._2.count() // force the final assignment once, like the query's first action
        r
      }
      val (pq, tPq) = ms {
        Similarity.pqRerankTopKBatch(codebook, codes, emb, "vec_id", "embedding",
          queries, "qid", "qv", k = 10, shortlist = 200, excludeSelfId = true)
          .select(col("qid"), col("id")).collect()
      }
      val (ex, tExact) = ms {
        Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
          queries, "qid", "qv", k = 10, excludeSelfId = true)
          .select(col("qid"), col("id")).collect()
      }
      println(f"[pqphase] iter=$i train=$tTrain%.3f adc_rerank=$tPq%.3f exact=$tExact%.3f " +
        f"total=${tTrain + tPq + tExact}%.3f (pq_rows=${pq.length}, exact_rows=${ex.length})")
    }
    spark.stop()
  }
}
