package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One flushed session of events for a key. */
final case class SessionBatch(
    user_id: Long,
    session_start: Long,
    n: Long,
    sum_value: Double)

/** Session assembly with event-time **timers** — the Spark-native form of
  * the reference's punctuator-driven flush (kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/regression/tests/KeyBatchExample.java:210-214
  * flushes on a schedule; the async framework explicitly cannot support
  * punctuators, kafka-client/src/main/java/dev/responsive/kafka/api/async/AsyncProcessorSupplier.java:96-118 — timers are the
  * transformWithState answer).
  *
  * Semantics (mirrors the session store, kafka-client/src/main/java/dev/responsive/kafka/internal/stores/ResponsiveSessionStore.java:131-163):
  * events buffer per key; a session is a maximal run of buffered events
  * with gaps ≤ `gap` (strict >-gap splits — an event at exactly
  * last + gap MERGES, matching Spark's session_window, pinned by the
  * boundary test). Sessions flush ONLY when the event-time watermark
  * passes their end + gap, via timers — never on arrival — so
  * out-of-order events across microbatches (any arrival order the
  * watermark still admits) merge into the right session instead of the
  * most recent one. Events below the watermark never reach the
  * processor (Spark drops them), so a flushed session can never receive
  * a late member as long as the watermark delay covers the grace.
  *
  * Used with TimeMode.EventTime over a watermarked input; the parity
  * spec asserts output == the q09 session-window aggregation.
  */
class SessionFlushProcessor(gapMs: Long) extends StatefulProcessor[Long, Event, SessionBatch] {
  @transient private var buf: ListState[Event] = _
  @transient private var curTimer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[Event]("buf", Encoders.product[Event], TTLConfig.NONE)
    curTimer = getHandle.getValueState[Long]("curTimer", Encoders.scalaLong, TTLConfig.NONE)
  }

  // HALF_UP at 2 decimals — the same rounding Spark's round() applies in
  // the batch oracles, so stream and batch agree even at exact midpoints
  // (math.rint is half-even and can differ by a cent).
  private def toBatch(key: Long, events: Seq[Event]): SessionBatch =
    SessionBatch(key,
      events.map(_.ts.getTime).min / 1000L,
      events.size.toLong,
      BigDecimal(events.map(_.value).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Split ts-sorted events into maximal ≤-gap runs (package-visible for
    * the property spec). */
  private[graft] def sessionize(sorted: Vector[Event]): Vector[Vector[Event]] = {
    val out = Vector.newBuilder[Vector[Event]]
    var cur = Vector.empty[Event]
    sorted.foreach { e =>
      if (cur.nonEmpty && e.ts.getTime > cur.last.ts.getTime + gapMs) {
        out += cur; cur = Vector.empty
      }
      cur = cur :+ e
    }
    if (cur.nonEmpty) out += cur
    out.result()
  }

  /** Flush every session the watermark has closed; keep the rest
    * buffered and (re)arm the timer at the earliest open deadline. */
  private def flushClosed(key: Long, watermarkMs: Long): Iterator[SessionBatch] = {
    val pending = if (buf.exists()) buf.get().toVector else Vector.empty[Event]
    if (pending.isEmpty) return Iterator.empty
    val sessions = sessionize(pending.sortBy(e => (e.ts.getTime, e.event_id)))
    // strict <: at wm == end+gap an event with ts == wm could still
    // merge (boundary rule), so the session is not closed yet
    val (closed, open) = sessions.partition(s => s.last.ts.getTime + gapMs < watermarkMs)
    if (open.isEmpty) buf.clear() else buf.put(open.flatten.toArray)
    // +1 ms: the timer must fire only once the watermark is strictly
    // past end+gap, else it would expire exactly at the boundary,
    // not flush, and re-arm an already-passed timestamp
    val deadline = open.map(s => s.last.ts.getTime + gapMs + 1).sorted.headOption
    val existing = if (curTimer.exists()) Some(curTimer.get()) else None
    if (existing != deadline) {
      existing.foreach(getHandle.deleteTimer)
      deadline match {
        case Some(dl) => getHandle.registerTimer(dl); curTimer.update(dl)
        case None => curTimer.clear()
      }
    }
    closed.map(toBatch(key, _)).iterator
  }

  override def handleInputRows(
      key: Long, rows: Iterator[Event], timerValues: TimerValues): Iterator[SessionBatch] = {
    val pending = if (buf.exists()) buf.get().toVector else Vector.empty[Event]
    buf.put((pending ++ rows).toArray)
    flushClosed(key, timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionBatch] = {
    curTimer.clear()
    flushClosed(key, timerValues.getCurrentWatermarkInMs())
  }
}
