package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget bins (the step between curation and tokenized
  * shard writing — a trainer consumes fixed-length sequences, not
  * ragged documents).
  *
  * Exact first-fit bin packing is inherently sequential state; the
  * scalable form here is deterministic CUMULATIVE packing: within a
  * shard, documents are ordered by a deterministic key and a document
  * joins the bin its cumulative token offset falls into —
  * `bin = floor((cumsum - tokens) / budget)`. Every bin is a contiguous
  * run of the order; a bin's total is at most `budget + maxDocTokens`
  * (one straddling document), the standard streaming-packing bound.
  * Oversized single documents (tokens > budget) get a bin of their own
  * rather than being dropped — truncation is the caller's policy.
  *
  * Scale shape: ONE window pass per shard. The shard column bounds the
  * window's task size — at 100 TB shard by a coarse deterministic key
  * (hash mod nShards) so packing parallelizes; bins are then
  * (shard, bin) pairs. Everything is a pure function of the data, so
  * the layout is reproducible and SQL-expressible (q68's oracle
  * recomputes it with a window cumsum).
  */
object Packing {

  /** Per-document bin assignment: adds (shard, bin, tokens) columns.
    * `orderCols` must be a deterministic total order within a shard
    * (include a unique id as the last key).
    */
  def packSequences(
      docs: DataFrame, tokensCol: Column, budget: Long,
      shardCol: Column, orderCols: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", shardCol)
      .withColumn("tokens", tokensCol.cast("long"))
      .withColumn("bin",
        floor((sum(col("tokens")).over(w) - col("tokens")) / lit(budget)).cast("long"))
  }
}
