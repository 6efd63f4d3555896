package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.XorChecksum
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** State-shaped operators with batch oracles: interval join, KV upsert +
  * TTL (default and row-level), dedup/fact store, checksum UDAF, and
  * batch-by-key flush. Streaming variants of the same semantics live in
  * graft.streaming and are asserted stream==batch in the test suite
  * (SURVEY §7 step 3).
  */
object StatefulOps {

  /** Q10 — stream-stream windowed join
    * (kafka-client/src/test/java/dev/responsive/kafka/integration/ResponsiveWindowStoreIntegrationTest.java:309-326:
    * JoinWindows.ofTimeDifferenceWithNoGrace;
    * duplicates retained via the STREAM schema / DuplicateKeyBuffer).
    * Purchases join errors of the same user within ±10 minutes.
    * Scale: equi-key on user_id makes this a hash join + time filter,
    * NOT a cartesian; state ∝ 2×window×rate per key in streaming. */
  val q10 = QueryDef(
    "q10_interval_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      val r = e.filter(col("event_type") === "error")
        .select(col("user_id").as("r_user_id"), col("ts").as("e_ts"), col("event_id").as("error_id"))
      l.join(r, col("user_id") === col("r_user_id") &&
          col("e_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("purchase_id"), col("error_id"), col("user_id"))
    },
    Some("""SELECT a.event_id AS purchase_id, b.event_id AS error_id, a.user_id AS user_id
           |FROM events a JOIN events b
           |  ON a.user_id = b.user_id
           | AND a.event_type = 'purchase' AND b.event_type = 'error'
           | AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts + INTERVAL 10 MINUTE""".stripMargin)
  )

  /** Latest row per user — the batch materialization of a KV store after
    * replaying upserts (builder.table semantics; last-write-wins,
    * kafka-client/src/main/java/dev/responsive/kafka/internal/stores/SchemaTypes.java KEY_VALUE). */
  private def latestPerUser(s: org.apache.spark.sql.SparkSession, d: String) = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  private val latestSql =
    """latest AS (
      |  SELECT * FROM (
      |    SELECT e.*, row_number() OVER (PARTITION BY user_id
      |                                   ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events e) WHERE rn = 1),
      |mx AS (SELECT max(ts) AS m FROM events)""".stripMargin

  /** Q12 — store-default TTL (TtlProvider.withDefault,
    * api/stores/TtlProvider.java:32-38): KV rows expire 6h after their
    * last write, judged against final stream time. */
  val q12 = QueryDef(
    "q12_ttl_default",
    (s, d) => {
      val maxTs = Tables.events(s, d).agg(max(col("ts")).as("m"))
      latestPerUser(s, d).crossJoin(broadcast(maxTs))
        .filter(col("ts") >= col("m") - expr("INTERVAL 6 HOURS"))
        .select(col("user_id"), col("event_id"),
          round(col("value"), 2).as("value"),
          col("ts").cast("long").as("ts_sec"))
    },
    Some(s"""WITH $latestSql
            |SELECT user_id, event_id, round(value, 2) AS value,
            |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
            |FROM latest, mx WHERE ts >= m - INTERVAL 6 HOUR""".stripMargin)
  )

  /** Q13 — row-level TTL from the value (TtlProvider.fromValue,
    * kafka-client/src/main/java/dev/responsive/kafka/api/stores/TtlProvider.java:63-113, infinite override supported): purchases
    * never expire, signups live 72h, everything else the 12h default —
    * declared through the Ttl policy API, enforced at read. */
  val q13 = QueryDef(
    "q13_ttl_row_level",
    (s, d) => {
      val policy = Ttl.withDefault(12 * 3600)
        .fromValue(
          when(col("event_type") === "purchase", Ttl.Infinite)
            .when(col("event_type") === "signup", 72L * 3600))
      val maxTs = Tables.events(s, d).agg(max(col("ts")).as("m"))
      policy.retain(latestPerUser(s, d).crossJoin(broadcast(maxTs)), col("ts"), col("m"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("long").as("ts_sec"))
    },
    Some(s"""WITH $latestSql
            |SELECT user_id, event_id, event_type,
            |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
            |FROM latest, mx
            |WHERE event_type = 'purchase'
            |   OR (event_type = 'signup' AND ts >= m - INTERVAL 72 HOUR)
            |   OR (event_type NOT IN ('purchase','signup') AND ts >= m - INTERVAL 12 HOUR)""".stripMargin)
  )

  /** Q13b — row-level TTL from the key (TtlProvider.fromKey,
    * kafka-client/src/main/java/dev/responsive/kafka/api/stores/TtlProvider.java:63-77): every 10th user is pinned forever, users
    * ending in 1-4 keep 48h, the rest fall back to the 6h default. */
  val q13b = QueryDef(
    "q13b_ttl_from_key",
    (s, d) => {
      val policy = Ttl.withDefault(6 * 3600)
        .fromKey(
          when(col("user_id") % 10 === 0, Ttl.Infinite)
            .when(col("user_id") % 10 <= 4, 48L * 3600))
      val maxTs = Tables.events(s, d).agg(max(col("ts")).as("m"))
      policy.retain(latestPerUser(s, d).crossJoin(broadcast(maxTs)), col("ts"), col("m"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("long").as("ts_sec"))
    },
    Some(s"""WITH $latestSql
            |SELECT user_id, event_id, event_type,
            |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
            |FROM latest, mx
            |WHERE user_id % 10 = 0
            |   OR (user_id % 10 <= 4 AND ts >= m - INTERVAL 48 HOUR)
            |   OR (user_id % 10 > 4 AND ts >= m - INTERVAL 6 HOUR)""".stripMargin)
  )

  /** Q14 — dedup / fact store ("records whether or not a key has been
    * seen", api/stores/ResponsiveStores.java:79-83): keep the first
    * arrival per (user_id, event_type), deterministically (dropDuplicates
    * has no ordering guarantee, so this is the row_number form — same
    * single shuffle). */
  val q14 = QueryDef(
    "q14_dedup_first",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts").cast("long").as("ts_sec"))
    },
    Some("""SELECT user_id, event_type, event_id,
           |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
           |FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type
           |                                     ORDER BY ts, event_id) AS rn
           |      FROM events e) WHERE rn = 1""".stripMargin)
  )

  /** Q21 — custom UDAF: order-insensitive XOR checksum per key
    * (AccumulatingChecksum analog, kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/e2etest/AccumulatingChecksum.java used
    * at kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/e2etest/E2ETestApplication.java:182-197; the reference's digest folds
    * offsets and is order-sensitive — Spark has no stable per-key offsets,
    * so ours is commutative; documented deviation, SURVEY §7). */
  val q21 = QueryDef(
    "q21_checksum_udaf",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(XorChecksum.column(col("event_id")).as("checksum"),
          count(lit(1)).as("n")),
    Some("""SELECT user_id,
           |  bit_xor(xor(xor(event_id, event_id << 13), event_id >> 7)) AS checksum,
           |  count(*) AS n
           |FROM events GROUP BY user_id""".stripMargin)
  )

  /** Q22 — batch-by-key with a flush trigger (kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/regression/tests/KeyBatchExample.java:126-219:
    * collect per-key, emit when the batch fills; trigger replayed here as
    * every-20-events in arrival order). The streaming twin uses
    * flatMapGroupsWithState (graft.streaming.BatchByKey). */
  val q22 = QueryDef(
    "q22_batch_by_key",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("batch_id", floor((col("rn") - 1) / 20).cast("long"))
        .groupBy(col("user_id"), col("batch_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"),
          expr("min_by(event_id, rn)").as("first_event"),
          expr("max_by(event_id, rn)").as("last_event"))
    },
    Some("""WITH t AS (SELECT e.*, row_number() OVER (PARTITION BY user_id
           |                                          ORDER BY ts, event_id) AS rn
           |           FROM events e)
           |SELECT user_id, CAST(floor((rn - 1) / 20.0) AS BIGINT) AS batch_id,
           |  count(*) AS n_events, round(sum(value), 2) AS sum_value,
           |  min_by(event_id, rn) AS first_event, max_by(event_id, rn) AS last_event
           |FROM t GROUP BY 1, 2""".stripMargin)
  )

  /** Q29 — left-outer stream-stream interval join (SURVEY §2.4
    * "left/outer variants"): every purchase, with its ±10-min errors or
    * nulls. Spark supports this in streaming with watermarks on both
    * sides (null rows emit once the watermark closes the window);
    * StreamOps.intervalJoin(joinType = "left_outer") is the twin. */
  val q29 = QueryDef(
    "q29_interval_left_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      val r = e.filter(col("event_type") === "error")
        .select(col("user_id").as("r_user_id"), col("ts").as("e_ts"), col("event_id").as("error_id"))
      l.join(r, col("user_id") === col("r_user_id") &&
          col("e_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"), "left_outer")
        .select(col("purchase_id"), col("error_id"), col("user_id"))
    },
    Some("""SELECT a.event_id AS purchase_id, b.event_id AS error_id, a.user_id AS user_id
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
           |LEFT OUTER JOIN (SELECT * FROM events WHERE event_type = 'error') b
           |  ON a.user_id = b.user_id
           | AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts + INTERVAL 10 MINUTE""".stripMargin)
  )

  /** Q30 — full-outer interval join: purchases and errors of the same
    * user within ±10 min, keeping unmatched rows from both sides
    * (completes the stream-stream join variant matrix with q10/q29). */
  val q30 = QueryDef(
    "q30_interval_full_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      val r = e.filter(col("event_type") === "error")
        .select(col("user_id").as("r_user_id"), col("ts").as("e_ts"), col("event_id").as("error_id"))
      l.join(r, col("user_id") === col("r_user_id") &&
          col("e_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"), "full_outer")
        .select(col("purchase_id"), col("error_id"),
          coalesce(col("user_id"), col("r_user_id")).as("uid"))
    },
    Some("""SELECT a.event_id AS purchase_id, b.event_id AS error_id,
           |  coalesce(a.user_id, b.user_id) AS uid
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
           |FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'error') b
           |  ON a.user_id = b.user_id
           | AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts + INTERVAL 10 MINUTE""".stripMargin)
  )

  /** Q36 — as-of join (point-in-time enrichment): each purchase is
    * joined to the user's most recent prior-or-simultaneous signup, or
    * null. Not an op the reference ships (SURVEY §2.4 note) but the
    * canonical training-data primitive for temporal correctness.
    * Implemented as a carry-forward window (last ignoring nulls) — one
    * shuffle on the key, no join, no range-scan state: the form that
    * survives 100 TB, vs. the naive per-row range join. */
  val q36 = QueryDef(
    "q36_asof_join",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("asof_signup_id",
          last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("asof_signup_id"))
    },
    Some("""SELECT event_id AS purchase_id, user_id, asof_signup_id FROM (
           |  SELECT event_id, user_id, event_type,
           |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY ts, event_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_id
           |  FROM events) t
           |WHERE event_type = 'purchase'""".stripMargin)
  )

  val all: Seq[QueryDef] = Seq(q10, q12, q13, q13b, q14, q21, q22, q29, q30, q36)
}
