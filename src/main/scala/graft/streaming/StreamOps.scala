package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed record for the `events` fixture (FIXTURES.md) — the engine's
  * KStream analog. */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

/** Stream/batch-dual transforms: every function here takes an events
  * DataFrame that may be **static or streaming** and returns the same
  * logical result — the stream/table duality the reference's runtime is
  * built around (KStream/KTable, SURVEY §1.1). The test suite asserts
  * stream==batch after full replay (SURVEY §7 step 3, the analog of the
  * reference's differential regression harness).
  *
  * Watermark semantics vs the reference (SURVEY §2.9): the reference
  * tracks per-partition observedStreamTime and drops writes below
  * `observedStreamTime - retention + 1`
  * (kafka-client/src/main/java/dev/responsive/kafka/internal/stores/ResponsiveWindowStore.java:148-152, 214-216); Spark's watermark is a
  * global minimum across partitions. After a full ordered replay both
  * yield the same final state, which is what the parity tests check.
  */
object StreamOps {

  /** Tumbling-window count/sum per user (Q7 twin;
    * TimeWindows.ofSizeWithNoGrace analog). */
  def tumblingAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("user_id"), col("n"), col("sum_value"))

  /** Hopping-window agg (Q8 twin; TimeWindows.advanceBy analog). */
  def hoppingAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("user_id"), col("n"), col("sum_value"))

  /** Session-window agg, 30 min inactivity gap (Q9 twin;
    * SessionWindows.ofInactivityGapAndGrace analog — retention = gap +
    * grace maps to the watermark delay,
    * kafka-client/src/main/java/dev/responsive/kafka/api/stores/ResponsiveSessionParams.java:48-56). */
  def sessionAgg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("session_window.start").cast("long").as("session_start"),
        col("user_id"), col("n"), col("sum_value"))

  /** First-arrival dedup per (user_id, event_type) (Q14 twin — the
    * fact/dedup store, api/stores/ResponsiveStores.java:79-83). In
    * streaming this is dropDuplicates over keyed state; arrival order =
    * source order. */
  def dedupFirst(events: DataFrame): DataFrame =
    events
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").cast("long").as("ts_sec"))

  /** Stream–stream interval join: purchases ⋈ errors of the same user
    * within ±10 min (Q10 twin; JoinWindows.ofTimeDifferenceWithNoGrace,
    * duplicates retained — the STREAM window-store schema,
    * ResponsiveWindowParams.streamStreamJoin). Both sides need
    * watermarks for state cleanup in streaming mode. */
  def intervalJoin(
      events: DataFrame,
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    val r = events.filter(col("event_type") === "error")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("r_user_id"), col("ts").as("e_ts"), col("event_id").as("error_id"))
    l.join(r, col("user_id") === col("r_user_id") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("e_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"), joinType)
      .select(col("purchase_id"), col("error_id"), col("user_id"))
  }

  /** Stream–table enrichment: events joined to a static dimension on the
    * key — the GlobalKTable / stream-static broadcast join
    * (kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/regression/tests/STJoinExample.java:68-77, kafka-client/src/main/java/dev/responsive/kafka/internal/stores/GlobalOperations.java). */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))
}
