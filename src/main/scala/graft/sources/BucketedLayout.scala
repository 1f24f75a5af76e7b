package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed table layouts — the write-path side of shuffle elimination
  * (DESIGN.md roadmap item 4; SURVEY §4 physical-layout levers).
  *
  * A table written with `bucketBy(n, key)` carries HashPartitioning(key, n)
  * in its scan, so every downstream operator that needs
  * ClusteredDistribution(key) — fact-fact joins, keyed aggregations, the
  * custom merge as-of join — gets its exchange ELIDED by
  * EnsureRequirements. At 100 TB the fact-fact shuffle is the single
  * largest network cost in the pipeline; two tables bucketed to the same
  * (key, n) join with zero data movement, and a `sortBy` within buckets
  * additionally elides the sort-merge join's per-partition sorts.
  *
  * The reference lands Kafka micro-batches as unbucketed appends
  * (SURVEY §2.1 S3); this is the layout its serving joins would need.
  *
  * Read-side configs that complete the story:
  *   - `spark.sql.legacy.bucketedTableScan.outputOrdering=true` lets the
  *     scan report the within-bucket sort order, eliding sort-merge-join
  *     sorts. Off by default since 3.0 because multi-file buckets
  *     interleave sorted runs; [[writeBucketed]] guarantees one file per
  *     bucket, where the claim is sound.
  *   - `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` keeps
  *     the bucketed scan for non-join queries so equality filters on the
  *     bucket key prune to a single bucket (`SelectedBucketsCount: 1 out
  *     of n`) — the planner's auto-disable rule considers only
  *     distribution reuse, not pruning.
  */
object BucketedLayout {

  /** Persist `df` as a parquet table bucketed (and bucket-sorted) on
    * `bucketCols`. The pre-write `repartition(numBuckets, bucketCols)`
    * uses the same Murmur3 hash as the bucketing spec, so every task holds
    * exactly one bucket and writes exactly ONE file per bucket — the
    * single-file-per-bucket layout Spark requires before it reports the
    * within-bucket sort order to the optimizer (multi-file buckets would
    * interleave sorted runs, so the scan drops the ordering claim and
    * sort-merge joins re-sort).
    *
    * Streaming note: for continuous ingest, write micro-batches unbucketed
    * and roll them into the bucketed layout with a periodic compaction
    * pass (this method) — bucketed writes require a full shuffle, which a
    * low-latency micro-batch should not pay per trigger.
    */
  def writeBucketed(
      df: DataFrame, table: String, numBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.nonEmpty) sortCols else bucketCols
    df.repartition(numBuckets, bucketCols.map(col): _*)
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }

  /** Hive-style directory partitioning — the time-axis complement to
    * bucketing: partition on low-cardinality scan predicates (event date,
    * feed) so date-range queries prune whole directories at PLANNING time
    * (`PartitionFilters` in the scan, zero I/O for pruned partitions),
    * while bucketing handles the high-cardinality join keys. The
    * pre-write repartition on the partition columns gives one file per
    * partition instead of one per (input task x partition) — the
    * small-files failure mode of naive partitioned appends.
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
