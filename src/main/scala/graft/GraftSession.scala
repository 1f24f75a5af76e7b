package graft

import org.apache.spark.sql.SparkSession

/** Engine session factory: the SparkSession configuration this library is
  * designed against, in one place.
  *
  * Local harness: `GraftSession.local(cores)`. Cluster: start from
  * [[builder]] and set master/deploy options externally (spark-submit).
  */
object GraftSession {

  /** Base builder with the engine's required + recommended configuration:
    *   - UTC session time zone (oracle parity; SURVEY §1.2),
    *   - AQE on with skew-join handling (runtime re-plan at scale),
    *   - extensions registered (SQL-callable native functions),
    *   - RocksDB state store for large streaming state (SURVEY §7),
    *   - nanos-as-long parquet reading (harness events table).
    */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session sized for this machine: shuffle partitions = cores (the
    * 200 default is wrong in local mode).
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors): SparkSession =
    builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
