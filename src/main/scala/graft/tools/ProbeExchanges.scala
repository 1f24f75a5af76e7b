package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Measures the per-query SHUFFLE-exchange counts that ExchangeLintSpec
  * pins (r15 judge item 8): runs each of the bench's top-10 most
  * expensive queries at sf0.001 under a QueryExecutionListener and sums
  * shuffle exchanges over every execution the query triggers (the
  * eager verdict builders run many). Broadcast exchanges are excluded —
  * they are the cheap plan shape the lint wants queries to PREFER.
  */
object ProbeExchanges {

  def countShuffles(qe: QueryExecution): Int = {
    val plan = qe.executedPlan.toString.split("== Initial Plan ==").head
    plan.linesIterator.count { l =>
      val t = l.dropWhile(c => !c.isLetter)
      t.startsWith("Exchange hashpartitioning") ||
        t.startsWith("Exchange rangepartitioning") ||
        t.startsWith("Exchange SinglePartition")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    // default = the original r16 top-12; pass names as args for the r17
    // extended tier (every query >= 1 s committed bench cost)
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q227_persisted_ann_index", "q129_semantic_dedup", "q223_zorder3_compact",
      "q128_doc_chunks", "q100_curation_extended", "q155_curation_capstone",
      "q216_zorder_compact", "q126_tx_sql_travel", "q166_whitened_pq",
      "q136_canonical_quality_dedup", "q236_bulk_ann_serve",
      "q240_curation_chain")
    val counts = new java.util.concurrent.atomic.AtomicInteger(0)
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        counts.addAndGet(countShuffles(qe)); execs.incrementAndGet(); ()
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    def drain(prev: () => Int): Unit = {
      var last = -1; var stable = 0; var spins = 0
      while (stable < 2 && spins < 50) {
        val n = prev()
        if (n == last) stable += 1 else { stable = 0; last = n }
        spins += 1; Thread.sleep(60)
      }
    }
    spark.listenerManager.register(listener)
    names.foreach { name =>
      counts.set(0); execs.set(0)
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      drain(() => counts.get + execs.get * 1000)
      println(s"[exchanges] $name shuffles=${counts.get} executions=${execs.get}")
    }
    spark.stop()
  }
}
