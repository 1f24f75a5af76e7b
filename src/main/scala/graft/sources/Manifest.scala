package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SNAPSHOT-CONSISTENT MULTI-TABLE READS (X112) — the blue/green
  * pointer discipline ([[graft.llmops.AnnIndex]]'s X103) generalized to
  * N tables × epochs: a pipeline that lands one logical unit of work
  * across SEVERAL Tx tables (the X104 capstone's five lanes, a
  * fact+dimension pair, assignments+codes of an index) commits each
  * table independently — so a crash between lane commits leaves a
  * PARTIAL multi-table state visible to anyone reading the tables
  * directly. The manifest closes that window: after all lanes of an
  * epoch commit, ONE atomic append records (epoch, table, version) for
  * every lane; readers resolve through the manifest and see
  * all-or-nothing — an unpublished epoch does not exist for them.
  *
  * Guarantees, each from an existing Tx primitive:
  *   - atomicity: one publish = one commit; an epoch's rows are either
  *     all visible or absent (never torn);
  *   - exactly-once: the publish carries the (app, epoch) txn id — a
  *     replayed epoch's re-publish is a log-level no-op;
  *   - monotonicity: [[resolve]] returns the HIGHEST published epoch;
  *     a reader caching (epoch, versions) can only move forward;
  *   - cross-table time travel: [[resolve]] at an explicit epoch
  *     returns that epoch's version set — the whole multi-table state
  *     as of any published unit of work, as long as vacuum retention
  *     covers it.
  *
  * The 100 TB consumer: a downstream job chains from N curated lanes
  * and must never join epoch-k rows of one lane against epoch-(k−1)
  * rows of another — resolving versions once per run and passing them
  * to [[TxParquetTable.snapshot]] pins every scan to one consistent
  * cut, at the cost of a driver-side read of one tiny table.
  */
object Manifest {

  /** Record an epoch's (table → version) set in ONE atomic, txn-guarded
    * append. Call AFTER every lane's commit for the epoch landed.
    * Returns the manifest's committed version (the current version when
    * the epoch was already published — replay no-op).
    */
  def publish(spark: SparkSession, manifestPath: String, epoch: Long,
      versions: Map[String, Long], app: String = "graft-manifest"): Long = {
    require(versions.nonEmpty, "publish: empty version set")
    import spark.implicits._
    TxParquetTable.append(
      versions.toSeq.sortBy(_._1)
        .map { case (t, v) => (epoch, t, v) }
        .toDF("epoch", "table", "version"),
      manifestPath, txn = Some((app, epoch)))
  }

  /** The (epoch, table → version) cut readers should pin: the highest
    * published epoch by default, or an explicit past epoch (cross-table
    * time travel). Fails loudly on an empty manifest or an unpublished
    * requested epoch.
    */
  def resolve(spark: SparkSession, manifestPath: String,
      epoch: Option[Long] = None): (Long, Map[String, Long]) = {
    require(TxParquetTable.latestVersion(manifestPath) >= 0,
      s"resolve: no manifest at $manifestPath — publish an epoch first")
    import spark.implicits._
    val all = TxParquetTable.snapshot(spark, manifestPath)
      .select(col("epoch"), col("table"), col("version"))
      .as[(Long, String, Long)].collect()
    val target = epoch.getOrElse(all.map(_._1).max)
    val rows = all.filter(_._1 == target)
    require(rows.nonEmpty,
      s"resolve: epoch $target not published at $manifestPath " +
        s"(published: ${all.map(_._1).distinct.sorted.mkString(", ")})")
    (target, rows.map(t => (t._2, t._3)).toMap)
  }

  /** A consistent multi-table read: snapshot every named table at the
    * resolved epoch's version. `paths` maps manifest table names to
    * filesystem paths; names absent from the manifest epoch fail
    * loudly (a lane added later has no version in an old cut).
    */
  def snapshotAll(spark: SparkSession, manifestPath: String,
      paths: Map[String, String],
      epoch: Option[Long] = None): (Long, Map[String, DataFrame]) = {
    val (e, versions) = resolve(spark, manifestPath, epoch)
    val frames = paths.map { case (name, path) =>
      val v = versions.getOrElse(name, throw new IllegalArgumentException(
        s"snapshotAll: table '$name' not in manifest epoch $e " +
          s"(has: ${versions.keys.toSeq.sorted.mkString(", ")})"))
      name -> TxParquetTable.snapshot(spark, path, Some(v))
    }
    (e, frames)
  }
}
