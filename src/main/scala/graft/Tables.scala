package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Harness-table reader, shared by the driver contract ([[SparkEntry]]),
  * the bench/verify mains, the dev probes, and every test suite — ONE
  * place that knows how the driver encodes `events.ts` on disk.
  *
  * The driver has shipped three parquet encodings of `ts` across rounds:
  *
  *   1. TIMESTAMP(NANOS): Spark 4 refuses it by default; read as long via
  *      `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to
  *      microseconds — integer `div`, not `/`, because epoch-nanos
  *      (~1.7e18) exceeds double's 2^53 exact range. DuckDB truncates
  *      NANOS→micros identically.
  *   2. TIMESTAMP_MICROS isAdjustedToUTC=0: Spark 4 reads TIMESTAMP_NTZ;
  *      cast to TIMESTAMP — under the engine's pinned UTC session time
  *      zone the wall-clock micros ARE the epoch micros, so the instants
  *      match DuckDB's NTZ read exactly.
  *   3. TIMESTAMP_MICROS isAdjustedToUTC=1: Spark reads TimestampType
  *      directly; pass through.
  *
  * All three normalize to session-UTC `TimestampType` with identical
  * epoch-microsecond values — [[graft.SourcesSpec]] locks this contract
  * against the next driver-side regen.
  */
object Tables {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Read `dir/name.parquet`, normalizing a `ts` column per the table
    * above. Tables without `ts` pass through untouched.
    *
    * SIDE EFFECT, deliberate (r9 advice asked it be visible here, not
    * only on the object): this MUTATES the session — it sets BOTH
    * session confs the normalization depends on, the legacy nanos read
    * AND `spark.sql.session.timeZone=UTC`, for the whole session, not
    * just this read. A caller who had set a non-UTC zone gets a WARN
    * log naming the overwrite. The NTZ→Timestamp cast interprets
    * wall-clock micros in the session zone, so without the UTC pin a
    * session built outside [[GraftSession]] (which pins it) would shift
    * every instant by the local offset — silently, unlike the loud
    * DATATYPE_MISMATCH the raw NTZ column produces. The whole engine
    * contract (oracle parity, SURVEY §1.2) is UTC; this loader owning
    * the pin is what makes "always load events through it" safe advice
    * for ad-hoc tools.
    */
  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tz = s.conf.get("spark.sql.session.timeZone", "")
    if (tz.nonEmpty && tz != "UTC") log.warn(
      s"Tables.load pins spark.sql.session.timeZone=UTC for this session (was: $tz) — " +
        "the engine contract is UTC and the NTZ ts cast resolves in the session zone")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeTs(s.read.parquet(s"$dir/$name.parquet"))
  }

  /** The `events` table (the only harness table with a `ts` column). */
  def events(s: SparkSession, dir: String): DataFrame = load(s, dir, "events")

  /** Normalize an already-read frame's `ts` column to TimestampType
    * epoch-micros (see encoding table in the object doc).
    *
    * `private[graft]` (r9 advice): the NTZ→Timestamp branch resolves in
    * the SESSION time zone, so calling this without [[load]]'s UTC pin
    * on a non-UTC session would silently shift every instant — exactly
    * the hazard the loader exists to close. Go through [[load]].
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
}
