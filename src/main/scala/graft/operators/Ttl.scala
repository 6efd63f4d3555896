package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level TTL policies — the TtlProvider analog
  * (/root/reference/kafka-client/src/main/java/dev/responsive/kafka/api/stores/TtlProvider.java:32-113,
  * TtlDuration 220-249) re-expressed Spark-first.
  *
  * A policy maps a row to a TTL in seconds via a Catalyst column
  * expression, so enforcement stays inside whole-stage codegen:
  *
  *  - `withDefault(sec)` / `withNoDefault` — the store-wide default
  *    (TtlProvider.withDefault / withNoDefault). No default means
  *    un-overridden rows never expire.
  *  - `.fromKey(expr)` / `.fromValue(expr)` / `.fromKeyAndValue(expr)` —
  *    a per-row override in seconds. The expression evaluating to NULL
  *    means "no override, fall back to the default" (the reference's
  *    `Optional.empty()`); evaluating to `Ttl.Infinite` means the row
  *    never expires (`TtlDuration.infinite()`). The reference splits
  *    key- from value-derived overrides because its rows are opaque
  *    bytes needing separate deserializers (StateDeserializer,
  *    kafka-client/src/main/java/dev/responsive/kafka/api/stores/TtlProvider.java:220-249); here key and value are both typed
  *    columns, so the three builders differ only in which columns the
  *    expression may reference — kept distinct for API parity and
  *    intent documentation.
  *
  * Enforcement is read-time filtering against stream time, like the
  * reference's TtlResolver (internal/stores/TtlResolver.java via
  * kafka-client/src/main/java/dev/responsive/kafka/internal/stores/PartitionedOperations.java:355-390): `retain` keeps rows with
  * `ts >= streamTime - effectiveTtl`. At scale this is a codegen'd
  * predicate on the scan — no state walk, no per-row UDF.
  */
final class TtlProvider private[operators] (
    defaultSec: Option[Long],
    overrideSec: Option[Column]) {

  private def withOverride(ttlSec: Column) =
    new TtlProvider(defaultSec, Some(ttlSec))

  /** Override derived from key columns (TtlProvider.fromKey). */
  def fromKey(ttlSec: Column): TtlProvider = withOverride(ttlSec)

  /** Override derived from value columns (TtlProvider.fromValue). */
  def fromValue(ttlSec: Column): TtlProvider = withOverride(ttlSec)

  /** Override derived from both (TtlProvider.fromKeyAndValue). */
  def fromKeyAndValue(ttlSec: Column): TtlProvider = withOverride(ttlSec)

  /** Effective TTL seconds per row: override, else default, else
    * infinite. */
  def effectiveTtlSec: Column = {
    val dflt = defaultSec.map(lit).getOrElse(lit(Ttl.Infinite))
    overrideSec.map(o => coalesce(o.cast("long"), dflt)).getOrElse(dflt)
  }

  /** Read-time liveness predicate: row with event time `ts` is alive at
    * `streamTime` (both TimestampType). */
  def alive(ts: Column, streamTime: Column): Column = {
    val eff = effectiveTtlSec
    eff === Ttl.Infinite || ts.cast("long") >= streamTime.cast("long") - eff
  }

  /** Filter `df` down to rows alive at `streamTime`. */
  def retain(df: DataFrame, ts: Column, streamTime: Column): DataFrame =
    df.filter(alive(ts, streamTime))
}

object Ttl {
  /** Sentinel TTL meaning "never expires" (TtlDuration.infinite()).
    * Negative so it can never collide with a real duration. */
  val Infinite: Long = -1L

  /** Store-wide default TTL (TtlProvider.withDefault). */
  def withDefault(sec: Long): TtlProvider = new TtlProvider(Some(sec), None)

  /** No default: rows without an override never expire
    * (TtlProvider.withNoDefault). */
  def withNoDefault: TtlProvider = new TtlProvider(None, None)
}
