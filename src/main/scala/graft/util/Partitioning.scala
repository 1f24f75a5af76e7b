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
    * At production scale inputs arrive in many row groups/files and this
    * no-ops (the partition count check costs only plan construction, no
    * job). The round-robin repartition of a small input is microseconds —
    * strictly dominated by the parallelism it unlocks.
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(target / 2, 2)) df.repartition(target) else df
  }
}
