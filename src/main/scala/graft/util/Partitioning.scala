package graft.util

import org.apache.spark.sql.DataFrame

/** Partitioning helpers. */
object Partitioning {

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
