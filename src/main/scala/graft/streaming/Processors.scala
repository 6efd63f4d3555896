package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The materialized KV row a KvStoreProcessor emits per upsert; rows
  * with `deleted = true` are changelog tombstones (the Kafka
  * null-value record analog). */
final case class KvRow(
    user_id: Long,
    event_id: Long,
    event_type: String,
    value: Double,
    ts_sec: Long,
    deleted: Boolean = false,
    ts_us: Long = 0L)

object KvStoreProcessor {
  /** Sentinel event_type standing in for a Kafka null-value record —
    * the engine's tables are typed rows, so "null value" needs an
    * in-band marker. */
  val Tombstone = "__tombstone"

  /** Event time at the store's full µs fidelity (Timestamp.getTime is
    * ms-truncated; the sub-ms part lives in getNanos). Read-time TTL
    * must compare at this precision — second-truncated `ts_sec` is
    * ambiguous within 1 s of the expiry boundary. */
  def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  /** LWW recency at full µs fidelity — `Timestamp.getTime` is
    * ms-truncated, so comparing at ms could order a same-millisecond
    * pair by event_id where the batch plans (and the DuckDB oracle)
    * order by the µs timestamp first. */
  def newer(a: Event, b: Event): Boolean = {
    val am = micros(a.ts); val bm = micros(b.ts)
    am > bm || (am == bm && a.event_id > b.event_id)
  }
}

/** Per-key last-write-wins KV store — the ResponsiveKeyValueStore analog
  * (/root/reference/kafka-client/src/main/java/dev/responsive/kafka/internal/stores/ResponsiveKeyValueStore.java:148-226)
  * on Spark 4's transformWithState arbitrary-state API.
  *
  * Semantics: upsert keyed by user_id, newest (ts, event_id) wins; every
  * input batch emits the key's current row (update-mode changelog, the
  * same shape as the reference's changelog capture).
  *
  *  - **delete**: an event whose event_type is the `Tombstone` sentinel
  *    clears the key's state and emits a `deleted = true` changelog row —
  *    the null-value ⇒ delete path of `ResponsiveKeyValueStore.put`
  *    (kafka-client/src/main/java/dev/responsive/kafka/internal/stores/ResponsiveKeyValueStore.java:148-155). A later event re-inserts.
  *    The delete obeys the same last-write-wins order as upserts: a
  *    tombstone older than the stored winner is a no-op, no matter which
  *    microbatch delivers it, so final state never depends on batch
  *    boundaries. The delete is physical (the statestore drops the key);
  *    with the marker gone, an upsert older than an already-applied
  *    tombstone that arrives even later re-inserts — the Kafka-compaction
  *    behavior once delete.retention.ms lapses.
  *  - **putIfAbsent mode**: first write wins, later upserts are ignored
  *    (kafka-client/src/main/java/dev/responsive/kafka/internal/stores/ResponsiveKeyValueStore.java:158-164 applied store-wide — the
  *    fact-table write discipline, api/stores/ResponsiveStores.java:73-96).
  *    Tombstones still delete, re-opening the key.
  *
  * Rows apply in (ts, event_id) order within a batch (the per-partition
  * offset order a Kafka-backed source would guarantee; the shuffle into
  * this operator does not preserve source order).
  *
  * TTL is enforced at **read** time against stream time, exactly like
  * the reference's `get(key, streamTimeMs)` filtering expired rows
  * (kafka-client/src/main/java/dev/responsive/kafka/internal/stores/PartitionedOperations.java:355-390, TtlResolver) — the reader applies
  * `ts_sec >= streamTime - ttl`; the parity spec does this with the
  * final stream time, matching the Q12 batch oracle.
  *
  * Scale: state is partitioned by key across executors (RocksDB-backed),
  * exactly the reference's partition-per-task layout minus the remote
  * store — Spark checkpoints own durability (SURVEY §2.9).
  */
class KvStoreProcessor(putIfAbsent: Boolean = false)
    extends StatefulProcessor[Long, Event, KvRow] {
  @transient private var state: ValueState[Event] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Event]("kv", Encoders.product[Event], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[Event],
      timerValues: TimerValues): Iterator[KvRow] = {
    var latest = if (state.exists()) state.get() else null
    var changed = false
    var lastTomb: Event = null
    rows.toVector.sortBy(e => (KvStoreProcessor.micros(e.ts), e.event_id)).foreach { e =>
      if (e.event_type == KvStoreProcessor.Tombstone) {
        // consistent LWW: a tombstone deletes only data it is newer than
        if (latest != null && KvStoreProcessor.newer(e, latest)) {
          latest = null; changed = true; lastTomb = e
        }
      } else if (putIfAbsent) {
        if (latest == null) { latest = e; changed = true }
      } else if (latest == null || KvStoreProcessor.newer(e, latest)) {
        latest = e
        changed = true
      }
    }
    if (!changed) Iterator.empty
    else if (latest == null) {
      state.clear()
      Iterator.single(KvRow(key, lastTomb.event_id, KvStoreProcessor.Tombstone,
        0.0, lastTomb.ts.getTime / 1000L, deleted = true,
        ts_us = KvStoreProcessor.micros(lastTomb.ts)))
    } else {
      state.update(latest)
      Iterator.single(KvRow(latest.user_id, latest.event_id, latest.event_type,
        latest.value, latest.ts.getTime / 1000L,
        ts_us = KvStoreProcessor.micros(latest.ts)))
    }
  }
}

/** One flushed batch of events for a key. */
final case class KeyBatch(
    user_id: Long,
    batch_id: Long,
    n_events: Long,
    sum_value: Double,
    first_event: Long,
    last_event: Long)

/** Batch-by-key with a count flush trigger — the KeyBatchExample analog
  * (/root/reference/kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/regression/tests/KeyBatchExample.java:126-219:
  * buffer per key in a KV store, flush on size/count, punctuator drains
  * stragglers). Buffered rows live in ListState, the batch counter in
  * ValueState; a `__flush` sentinel event drains the partial batch (the
  * punctuator analog — driven by the harness rather than wall-clock so
  * replays stay deterministic).
  */
class BatchByKeyProcessor(batchSize: Int) extends StatefulProcessor[Long, Event, KeyBatch] {
  @transient private var buf: ListState[Event] = _
  @transient private var nFlushed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[Event]("buf", Encoders.product[Event], TTLConfig.NONE)
    nFlushed = getHandle.getValueState[Long]("nFlushed", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def drain(key: Long, pending: Seq[Event]): KeyBatch = {
    val id = if (nFlushed.exists()) nFlushed.get() else 0L
    nFlushed.update(id + 1)
    // HALF_UP to match the batch oracle's round() exactly (see
    // SessionFlushProcessor.toBatch)
    KeyBatch(key, id, pending.size.toLong,
      BigDecimal(pending.map(_.value).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
      pending.head.event_id, pending.last.event_id)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[Event],
      timerValues: TimerValues): Iterator[KeyBatch] = {
    var pending = if (buf.exists()) buf.get().toVector else Vector.empty[Event]
    val out = Vector.newBuilder[KeyBatch]
    // The shuffle into this operator does not preserve source order within
    // a microbatch; normalize to (ts, event_id) at full µs fidelity — the
    // per-partition offset order a Kafka-backed source would guarantee.
    rows.toVector.sortBy(e => (KvStoreProcessor.micros(e.ts), e.event_id)).foreach { e =>
      if (e.event_type == "__flush") {
        if (pending.nonEmpty) { out += drain(key, pending); pending = Vector.empty }
      } else {
        pending = pending :+ e
        if (pending.size >= batchSize) { out += drain(key, pending); pending = Vector.empty }
      }
    }
    if (pending.isEmpty) buf.clear() else buf.put(pending.toArray)
    out.result().iterator
  }
}
