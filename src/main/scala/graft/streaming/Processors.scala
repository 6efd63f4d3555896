package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The materialized KV row a KvStoreProcessor emits per upsert. */
final case class KvRow(
    user_id: Long,
    event_id: Long,
    event_type: String,
    value: Double,
    ts_sec: Long)

/** Per-key last-write-wins KV store — the ResponsiveKeyValueStore analog
  * (/root/reference/kafka-client/src/main/java/dev/responsive/kafka/internal/stores/ResponsiveKeyValueStore.java:148-226)
  * on Spark 4's transformWithState arbitrary-state API.
  *
  * Semantics: upsert keyed by user_id, newest (ts, event_id) wins; every
  * input batch emits the key's current row (update-mode changelog, the
  * same shape as the reference's changelog capture). TTL is enforced at
  * **read** time against stream time, exactly like the reference's
  * `get(key, streamTimeMs)` filtering expired rows
  * (PartitionedOperations.java:355-390, TtlResolver) — the reader applies
  * `ts_sec >= streamTime - ttl`; the parity spec does this with the
  * final stream time, matching the Q12 batch oracle.
  *
  * Scale: state is partitioned by key across executors (RocksDB-backed),
  * exactly the reference's partition-per-task layout minus the remote
  * store — Spark checkpoints own durability (SURVEY §2.9).
  */
class KvStoreProcessor extends StatefulProcessor[Long, Event, KvRow] {
  @transient private var state: ValueState[Event] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Event]("kv", Encoders.product[Event], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[Event],
      timerValues: TimerValues): Iterator[KvRow] = {
    var latest = if (state.exists()) state.get() else null
    rows.foreach { e =>
      if (latest == null ||
          e.ts.getTime > latest.ts.getTime ||
          (e.ts.getTime == latest.ts.getTime && e.event_id > latest.event_id)) {
        latest = e
      }
    }
    if (latest == null) Iterator.empty
    else {
      state.update(latest)
      Iterator.single(KvRow(latest.user_id, latest.event_id, latest.event_type,
        latest.value, latest.ts.getTime / 1000L))
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
    KeyBatch(key, id, pending.size.toLong,
      math.rint(pending.map(_.value).sum * 100) / 100,
      pending.head.event_id, pending.last.event_id)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[Event],
      timerValues: TimerValues): Iterator[KeyBatch] = {
    var pending = if (buf.exists()) buf.get().toVector else Vector.empty[Event]
    val out = Vector.newBuilder[KeyBatch]
    // The shuffle into this operator does not preserve source order within
    // a microbatch; normalize to (ts, event_id) — the per-partition offset
    // order a Kafka-backed source would guarantee.
    rows.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
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
