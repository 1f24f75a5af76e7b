package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.floor

/** Partitioning helpers. */
object Partitioning {

  /** Cross-engine-stable 6-decimal rounding: floor(x*1e6 + 0.5)/1e6 is
    * pure IEEE arithmetic, bit-identical in Spark and DuckDB. Use for any
    * RATIONAL-valued output (ratios/averages of fixed-decimal data) —
    * their terminating decimal expansions land on exact half-boundaries
    * where Spark's decimal-rendering HALF_UP and DuckDB's binary rounding
    * disagree. (Irrational outputs — sqrt/ln/corr — can't sit on a
    * boundary; plain round is fine there.)
    */
  def stableRound6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d

  /** Ensure a frame entering compute-heavy per-row work (hashing, shingling,
    * vector math) has at least ~cluster parallelism. A parquet row group is
    * the minimum read unit per task, so a small table written as one row
    * group scans as ONE task no matter the split config — on local[32] that
    * leaves 31 cores idle through the most expensive operators.
    *
    * The "is it small" check reads the optimizer's size statistics — a
    * pure plan-side lookup. (The previous form asked `df.rdd` for its
    * partition count, which plans a whole second query with a
    * row-deserializer projection and its own codegen; statistics cost
    * nothing.) Below the threshold — a few MB per core — the round-robin
    * repartition is microseconds and strictly dominated by the
    * parallelism it unlocks; above it, the scan's own file/row-group
    * splits already provide parallelism and a forced shuffle would only
    * add cost, so this no-ops at production scale.
    */
  /** Run `body` with `spark.sql.shuffle.partitions` scoped DOWN to what
    * `rows` of data actually need, restoring the session setting in
    * finally (r19, guide §2.2). For work whose input size is KNOWN
    * up front — a fixpoint loop over a measured edge set, a bounded
    * verification stream whose rows were just collected — the session
    * width (sized for corpus scans) multiplies straight into wall time:
    * every sequential round/micro-batch pays `width` tasks of
    * scheduling (and, for stateful streams, `width` state-store
    * instances with per-batch commit I/O). The clamp saturates to the
    * session setting as `rows` grows, so this is a no-op exactly where
    * wide shuffles are right. Session-scoped mutation: callers run on
    * one driver thread between actions and the engine's Bench/Verify
    * discipline keeps queries sequential on the session.
    */
  def withShuffleWidth[A](spark: org.apache.spark.sql.SparkSession,
      rows: => Long, rowsPerPartition: Long)(body: => A): A = {
    require(rowsPerPartition > 0, "rowsPerPartition must be positive")
    val key = "spark.sql.shuffle.partitions"
    val sessionWidth = scala.util.Try(spark.conf.get(key).toInt).toOption
    sessionWidth match {
      case Some(w) if w > 1 =>
        val width = math.max(1L, math.min(w.toLong,
          (rows + rowsPerPartition - 1) / rowsPerPartition)).toString
        spark.conf.set(key, width)
        try body finally spark.conf.set(key, w.toString)
      case _ => body
    }
  }

  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Relations without computable stats (LogicalRDD, some views) report
    // spark.sql.defaultSizeInBytes = Long.MaxValue as a sentinel, not a
    // real size. Treating that as "big" would leave a tiny RDD-backed
    // frame single-task, so fall back to the physical partition count.
    val unknown = bytes >= BigInt(Long.MaxValue)
    val small =
      if (!unknown) bytes < target.toLong * 8L * 1024 * 1024
      else df.rdd.getNumPartitions < target // rare path; plan-time-only cost
    if (small) df.repartition(target) else df
  }
}
