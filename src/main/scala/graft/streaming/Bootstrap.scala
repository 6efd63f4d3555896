package graft.streaming

import graft.operators.TtlProvider
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}

/** MIGRATE-mode seed preparation. The reference's changelog backfill
  * skips point-lookups and drops rows already past their TTL while
  * replaying a changelog into the new store
  * (/root/reference/kafka-client/src/main/java/dev/responsive/kafka/internal/stores/PartitionedOperations.java:188-197,364-371)
  * — otherwise a migration resurrects rows the old store had already
  * let expire. Spark-first analog: the seed DataFrame is filtered
  * through the store's [[graft.operators.TtlProvider]] policy BEFORE it
  * reaches handleInitialState, a codegen'd predicate on the seed scan
  * (no per-key state walk). */
object Bootstrap {

  /** Drop seed rows whose TTL has already elapsed at `migrateTime`
    * (the stream-time at cutover). Rows with infinite/no TTL pass. */
  def migrateSeed(
      seed: DataFrame,
      ttl: TtlProvider,
      ts: Column,
      migrateTime: Column): DataFrame =
    ttl.retain(seed, ts, migrateTime)
}

/** Bootstrap / migration analog of the reference's changelog-migration
  * tool (kafka-client-bootstrap kafka-client/src/main/java/dev/responsive/kafka/bootstrap/ChangelogMigrationTool.java /
  * kafka-client-bootstrap/src/main/java/dev/responsive/kafka/bootstrap/main/BootstrapMain.java:60-75: replay an existing changelog topic into the
  * remote store before cutting the live app over).
  *
  * On Spark, the "changelog" is any batch Dataset of the current state
  * (e.g. a table the legacy system produced): it seeds each key's state
  * via handleInitialState on the first microbatch, after which live
  * events upsert on top — same last-write-wins contract as
  * KvStoreProcessor. Restore-after-failure itself needs no analog at
  * all: the streaming checkpoint replays state on restart
  * (kafka-client/src/main/java/dev/responsive/kafka/internal/stores/PartitionedOperations.java:165-172's restore-offset logic collapses
  * into Spark's checkpoint recovery, SURVEY §2.9).
  */
class BootstrapKvProcessor
  extends StatefulProcessorWithInitialState[Long, Event, KvRow, Event] {

  @transient private var state: ValueState[Event] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Event]("kv", Encoders.product[Event], TTLConfig.NONE)

  override def handleInitialState(key: Long, initial: Event, timerValues: TimerValues): Unit =
    state.update(initial)

  override def handleInputRows(
      key: Long,
      rows: Iterator[Event],
      timerValues: TimerValues): Iterator[KvRow] = {
    var latest = if (state.exists()) state.get() else null
    rows.foreach { e =>
      if (latest == null || KvStoreProcessor.newer(e, latest)) {
        latest = e
      }
    }
    if (latest == null) Iterator.empty
    else {
      state.update(latest)
      Iterator.single(KvRow(latest.user_id, latest.event_id, latest.event_type,
        latest.value, latest.ts.getTime / 1000L,
        ts_us = KvStoreProcessor.micros(latest.ts)))
    }
  }
}
