package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE over a Tx table (X110) —
  * the chained-ingestion payoff the X107 streaming source exists for:
  * a keyed aggregate view (count / sum / min / max per group) kept in a
  * Tx table and refreshed per COMMIT RANGE of the source, reading only
  * the new rows (log-only planning through `graft-tx-stream`) and only
  * the AFFECTED KEYS' current view rows (bucket-pruned
  * [[TxParquetTable.snapshotForIds]] — never a view scan). Refresh cost
  * is O(new data + touched keys), independent of both the fact table's
  * and the view's size: the 100 TB shape where a full `GROUP BY`
  * recompute is a multi-hour scan but a day's increment is minutes.
  *
  * Exactly-once: each epoch's merge lands as ONE keyed upsert carrying
  * the (app, epoch) stream-transaction id — a replayed epoch (restart
  * recovery) recomputes a frame from state that already includes its
  * delta, and the txn pre-check discards it before any rewrite is
  * planned, so the view never double-counts. The source's offsets are
  * commit versions checkpointed by the engine, so a resumed refresh
  * continues from exactly the next unseen commit.
  *
  * Maintainable aggregates only, by contract: count/sum are
  * commutative-monoid merges; min/max are maintainable because the
  * source stream is APPEND-ONLY (the graft-tx-stream append mode fails
  * loudly on delete/restore/upsert commits — exactly the commits that
  * would make min/max non-invertible). Group keys must be non-null
  * (the view id is the separator-joined key tuple; enforced in-plan).
  *
  * Reference shape: the pipeline's Cassandra tables are per-record
  * landings that downstream dashboards re-aggregate on every read
  * (`dags/ingestion_yfinance_data_to_cassandra_db.py:272-279` chains
  * collect -> land with no incremental layer); this operator is that
  * missing silver layer.
  */
object MaterializedView {

  /** One drain's accounting: epochs that REFRESHED the view (replayed
    * no-op epochs excluded), source rows read, keys touched by the
    * last refresh, and the view's committed version after the drain.
    */
  final case class MvRefreshReport(
      epochsApplied: Long, rowsIn: Long, mvVersion: Long)

  private val IdCol = "__mv_id"
  /** Key-tuple separator (\u0001): a control char no cast key contains;
    * without one ("ab","c") and ("a","bc") would alias to one view row.
    */
  private val Sep = "\u0001"

  /** The view's merge step for one epoch's new rows; exposed for batch
    * callers (a backfill outside streaming). Returns the committed view
    * version. `batch` is the source increment; the view row per key is
    * (keys..., __mv_id, n, sum_v, min_v, max_v).
    */
  def mergeIncrement(batch: DataFrame, mvPath: String, keyCols: Seq[String],
      valueCol: String, buckets: Int = 16,
      txn: Option[(String, Long)] = None): Long = {
    require(keyCols.nonEmpty, "maintainAggView: at least one group key")
    // non-null key contract, enforced in-plan: concat_ws silently DROPS
    // nulls, which would alias (a, null) with (a) — fail instead
    val keyed = batch.select(
      (keyCols.map(k =>
        when(col(k).isNull, raise_error(lit(
          s"maintainAggView: null group key '$k' — the view id is the " +
            "joined key tuple; filter or default nulls upstream")))
          .otherwise(col(k)).as(k)) :+ col(valueCol).as("__v")): _*)
    // pin the delta (keys-sized, cheap): it feeds BOTH the point-lookup
    // probe and the merge — without the pin each consumer re-scans the
    // epoch's source files (and the engine's numInputRows accounting
    // counts every scan, breaking the exactly-the-increment report)
    val delta = keyed
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("sum_v"),
        min(col("__v")).as("min_v"), max(col("__v")).as("max_v"))
      .withColumn(IdCol,
        concat_ws(Sep, keyCols.map(k => col(k).cast("string")): _*))
      .localCheckpoint(true)
    val exists = TxParquetTable.latestVersion(mvPath) >= 0
    val merged = if (!exists) delta else {
      // current rows for EXACTLY the touched keys: bucket-pruned point
      // lookup, never a view scan (a wide-key epoch degrades to the
      // affected buckets, still not the table)
      val old = TxParquetTable.snapshotForIds(
          batch.sparkSession, mvPath, IdCol, delta.select(IdCol))
        .select(col(IdCol), col("n").as("__o_n"), col("sum_v").as("__o_s"),
          col("min_v").as("__o_mn"), col("max_v").as("__o_mx"))
      // type-preserving zero (x*0): a LONG measure column must merge in
      // long arithmetic — coalescing with lit(0.0) would silently widen
      // exact integer sums to double
      delta.join(old, Seq(IdCol), "left").select(
        (keyCols.map(col) :+ col(IdCol) :+
          (col("n") + coalesce(col("__o_n"), lit(0L))).as("n") :+
          (col("sum_v") + coalesce(col("__o_s"), col("sum_v") * lit(0))).as("sum_v") :+
          least(col("min_v"), col("__o_mn")).as("min_v") :+
          greatest(col("max_v"), col("__o_mx")).as("max_v")): _*)
    }
    TxParquetTable.upsert(merged, mvPath, IdCol, buckets, txn = txn)
  }

  /** Drain every unseen source commit through the view (one
    * Trigger.AvailableNow run; `maxFilesPerTrigger` bounds each bite),
    * maintaining `mvPath` exactly-once. Re-running with the same
    * checkpoint resumes from the next unseen commit — a caller loop IS
    * the refresh schedule.
    */
  def maintainAggView(
      spark: SparkSession,
      srcPath: String,
      mvPath: String,
      checkpoint: String,
      keyCols: Seq[String],
      valueCol: String,
      app: String = "graft-mv",
      buckets: Int = 16,
      maxFilesPerTrigger: Option[Int] = None,
      timeoutMs: Long = 300000L): MvRefreshReport = {
    val applied = new java.util.concurrent.atomic.AtomicLong(0)
    val reader = spark.readStream.format("graft-tx-stream")
      .option("path", srcPath)
    val q = maxFilesPerTrigger.fold(reader)(m =>
        reader.option("maxFilesPerTrigger", m.toString))
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val before = TxParquetTable.latestVersion(mvPath)
        val v = mergeIncrement(batch, mvPath, keyCols, valueCol, buckets,
          txn = Some((app, epochId)))
        if (v > before) applied.incrementAndGet()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(timeoutMs)
      Option(q.exception.orNull).foreach(throw _)
    } finally q.stop()
    // rows read, from the engine's own progress accounting (no second
    // pass over the epoch's files)
    val rowsIn = q.recentProgress.map(_.numInputRows).sum
    MvRefreshReport(applied.get(), rowsIn,
      TxParquetTable.latestVersion(mvPath))
  }
}
