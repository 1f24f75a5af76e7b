package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional parquet table: a commit log (`_graft_log/`) over plain
  * parquet data files, giving atomic multi-file commits, snapshot
  * isolation, OPTIMISTIC concurrent-writer safety, and time travel —
  * the design published for Delta Lake (Armbrust et al., VLDB 2020),
  * reduced to the pieces this engine needs (DESIGN.md roadmap item 8).
  *
  * Protocol:
  *   - Data files are written under `data/` with globally unique names;
  *     a writer stages files first, then publishes a commit.
  *   - Commit N is the file `_graft_log/%020d.json` — one JSON object per
  *     line is avoided; the whole commit is a single JSON document with
  *     `add` / `remove` file-name arrays and the writer's declared
  *     `buckets` conflict domain.
  *   - Publishing is an ATOMIC create-if-absent of that commit file
  *     (ATOMIC_MOVE of a staged temp file; both local FS and HDFS-like
  *     stores give create-without-overwrite atomicity). Losing a race
  *     means the version exists — re-read the log, CHECK CONFLICTS,
  *     retry at N+1.
  *   - Conflict rule: two commits conflict iff their declared bucket sets
  *     intersect (appends declare no buckets and never conflict; an
  *     upsert of buckets {3, 7} conflicts only with a concurrent upsert
  *     touching 3 or 7). On conflict the loser's staged files are
  *     deleted and the commit attempt fails to the caller.
  *   - A snapshot at version V is (all adds) minus (all removes) across
  *     commits <= V — readers never see a half-published commit, and
  *     old versions stay readable until vacuum.
  *
  * At 100 TB the log is the scalability lever: state per commit is file
  * NAMES (KBs), not data; snapshot resolution is a driver-side fold over
  * the log, and data file I/O remains fully parallel. Log compaction
  * (checkpoint parquet every N commits) is the known growth path and is
  * out of scope here.
  */
object TxParquetTable {

  private def logDir(path: String) = new File(path, "_graft_log")
  private def dataDir(path: String) = new File(path, "data")

  private case class Commit(version: Long, add: Seq[String], remove: Seq[String], buckets: Seq[Int])

  // minimal JSON for the fixed commit shape (no deps beyond the JDK)
  private def render(c: Commit): String = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    s"""{"version":${c.version},"add":${arr(c.add)},"remove":${arr(c.remove)},"buckets":${c.buckets.mkString("[", ",", "]")}}"""
  }

  private def parse(s: String, version: Long): Commit = {
    def strArr(key: String): Seq[String] = {
      val m = (s""""$key":\\[([^\\]]*)\\]""").r.findFirstMatchIn(s)
      m.map(_.group(1)).filter(_.nonEmpty)
        .map(_.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")))
        .getOrElse(Seq.empty)
    }
    val buckets = (""""buckets":\[([^\]]*)\]""").r.findFirstMatchIn(s)
      .map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq.empty)
    Commit(version, strArr("add"), strArr("remove"), buckets)
  }

  private def commits(path: String): Seq[Commit] = {
    val d = logDir(path)
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName).toSeq
      .map { f =>
        val v = f.getName.stripSuffix(".json").toLong
        parse(new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8), v)
      }
  }

  /** Latest committed version, or -1 for an empty/new table. */
  def latestVersion(path: String): Long =
    commits(path).lastOption.map(_.version).getOrElse(-1L)

  /** Live data files at `version` (default: latest). */
  private def liveFiles(path: String, version: Option[Long]): Seq[String] = {
    val cs = commits(path).filter(c => version.forall(c.version <= _))
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    cs.foreach { c => live --= c.remove; live ++= c.add }
    live.toSeq
  }

  /** Snapshot read. `version = Some(v)` time-travels to commit v. */
  def snapshot(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val files = liveFiles(path, version)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files.map(f => new File(dataDir(path), f).getAbsolutePath): _*)
  }

  /** Stage `df` as parquet files under data/ and return their names. */
  private def stage(df: DataFrame, path: String): Seq[String] = {
    dataDir(path).mkdirs()
    val tmp = new File(path, s".stage-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val parts = tmp.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
    val names = parts.map { p =>
      val name = s"${java.util.UUID.randomUUID()}.parquet"
      Files.move(p.toPath, new File(dataDir(path), name).toPath)
      name
    }
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    names
  }

  /** Try to publish a commit; retries on version races, fails (cleaning
    * up staged files) on a genuine bucket conflict. Returns the committed
    * version.
    */
  private def publish(
      path: String, add: Seq[String], remove: Seq[String], buckets: Seq[Int],
      readVersion: Long, maxRetries: Int = 20): Long = {
    logDir(path).mkdirs()
    var attempt = 0
    while (attempt < maxRetries) {
      val seen = commits(path)
      // conflict check against commits that landed after our read snapshot:
      // an upsert conflicts with an overlapping upsert AND with any append
      // (buckets empty = unknown content — its rows are not in our remove
      // set, so proceeding could resurrect replaced ids). Appends
      // themselves never conflict.
      val interlopers = seen.filter(_.version > readVersion)
      if (buckets.nonEmpty && interlopers.exists(i =>
          i.buckets.isEmpty || i.buckets.intersect(buckets).nonEmpty)) {
        add.foreach(f => new File(dataDir(path), f).delete())
        throw new java.util.ConcurrentModificationException(
          s"tx conflict on buckets ${buckets.mkString(",")} at $path " +
            s"(concurrent commits: ${interlopers.map(_.version).mkString(",")})")
      }
      val next = seen.lastOption.map(_.version + 1).getOrElse(0L)
      val target = new File(logDir(path), f"$next%020d.json").toPath
      val tmp = Files.write(
        Paths.get(path, s".commit-${java.util.UUID.randomUUID()}.tmp"),
        render(Commit(next, add, remove, buckets)).getBytes(StandardCharsets.UTF_8))
      try {
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); attempt += 1 // lost the race; re-read and retry
      }
    }
    add.foreach(f => new File(dataDir(path), f).delete())
    throw new IllegalStateException(s"gave up publishing after $maxRetries races at $path")
  }

  /** Atomic append — never conflicts. Returns the committed version. */
  def append(df: DataFrame, path: String): Long = {
    val v = latestVersion(path)
    publish(path, stage(df, path), Seq.empty, Seq.empty, v)
  }

  /** Transactional keyed upsert: replaces whole hash-buckets of rows.
    * `df` is bucketed on `idCol` (same scheme as the streaming upsert
    * sink); survivors of the affected buckets are rewritten together with
    * the new rows in ONE atomic commit that declares those buckets as its
    * conflict domain — a concurrent upsert of disjoint buckets commits
    * freely, an overlapping one fails cleanly. Returns the version.
    */
  def upsert(df: DataFrame, path: String, idCol: String, buckets: Int = 16,
      asOfVersion: Option[Long] = None): Long = {
    val spark = df.sparkSession
    // asOfVersion pins the read snapshot explicitly — callers implementing
    // their own retry loop pass the version they actually read, so a
    // commit landing between their read and this call is DETECTED as a
    // conflict instead of silently absorbed
    val readVersion = asOfVersion.getOrElse(latestVersion(path))
    val bucketed = df
      .withColumn("__bucket", pmod(xxhash64(col(idCol)), lit(buckets)).cast("int"))
      .dropDuplicates(idCol)
      .localCheckpoint(true) // pin the batch; its plan must not re-read the table
    val affected = bucketed.select("__bucket").distinct().collect().map(_.getInt(0)).toSeq
    if (affected.isEmpty) return readVersion
    // pin the snapshot to our read version — snapshot(None) would read
    // "latest" and silently absorb a concurrent commit's files
    val current =
      if (readVersion < 0) spark.emptyDataFrame else snapshot(spark, path, Some(readVersion))
    val (adds, removes) =
      if (current.isEmpty) (stage(bucketed, path), Seq.empty[String])
      else {
        val currentB = current.withColumn("__bucket",
          pmod(xxhash64(col(idCol)), lit(buckets)).cast("int"))
        val survivors = currentB
          .filter(col("__bucket").isin(affected: _*))
          .join(bucketed.select(col(idCol).as("__new_id")),
            col(idCol) === col("__new_id"), "left_anti")
          .drop("__new_id")
        // removed files = every live file that CONTAINS an affected bucket;
        // conservatively rewrite untouched buckets co-located in those
        // files (append-created files can mix buckets)
        // per-file bucket probe; a stats-in-log column (Delta-style
        // per-file min/max) is the growth path that removes this read
        val affectedFiles = liveFiles(path, Some(readVersion)).filter { f =>
          val fb = spark.read.parquet(new File(dataDir(path), f).getAbsolutePath)
            .withColumn("__bucket", pmod(xxhash64(col(idCol)), lit(buckets)).cast("int"))
            .select("__bucket").distinct().collect().map(_.getInt(0)).toSet
          fb.intersect(affected.toSet).nonEmpty
        }
        val keepFromAffected = spark.read.parquet(
            affectedFiles.map(f => new File(dataDir(path), f).getAbsolutePath): _*)
          .withColumn("__bucket", pmod(xxhash64(col(idCol)), lit(buckets)).cast("int"))
          .filter(!col("__bucket").isin(affected: _*))
        val rewrite = survivors.unionByName(keepFromAffected).unionByName(bucketed)
          .localCheckpoint(true)
        (stage(rewrite, path), affectedFiles)
      }
    publish(path, adds, removes, affected, readVersion)
  }
}
