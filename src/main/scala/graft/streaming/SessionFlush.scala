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
  * the reference's punctuator-driven flush (KeyBatchExample.java:210-214
  * flushes on a schedule; the async framework explicitly cannot support
  * punctuators, AsyncProcessorSupplier.java:96-118 — timers are the
  * transformWithState answer).
  *
  * Semantics (mirrors the session store, ResponsiveSessionStore.java:131-163):
  * events buffer per key; an arrival more than `gap` after the buffered
  * session's end closes that session inline (the store's merge/close on
  * arrival); the **trailing** session closes when the event-time watermark
  * passes its end + gap, via a registered timer — no sentinel data needed,
  * just watermark progress.
  *
  * Used with TimeMode.EventTime over a watermarked input; the parity spec
  * asserts output == the q09 session-window aggregation.
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

  override def handleInputRows(
      key: Long, rows: Iterator[Event], timerValues: TimerValues): Iterator[SessionBatch] = {
    var pending = if (buf.exists()) buf.get().toVector else Vector.empty[Event]
    val out = Vector.newBuilder[SessionBatch]
    rows.toVector.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      // strict > : Spark's session_window MERGES an event at exactly
      // last + gap (touching intervals coalesce — pinned by the boundary
      // test in StreamingParitySpec), so only a strictly-later arrival
      // closes the session, matching the q09 oracle's break rule
      if (pending.nonEmpty && e.ts.getTime > pending.map(_.ts.getTime).max + gapMs) {
        out += toBatch(key, pending) // session closed by a later arrival
        pending = Vector.empty
      }
      pending = pending :+ e
    }
    if (pending.isEmpty) buf.clear()
    else {
      buf.put(pending.toArray)
      // (re)arm the trailing-session timer at session end + gap
      val deadline = pending.map(_.ts.getTime).max + gapMs
      if (curTimer.exists() && curTimer.get() != deadline) getHandle.deleteTimer(curTimer.get())
      if (!curTimer.exists() || curTimer.get() != deadline) {
        getHandle.registerTimer(deadline)
        curTimer.update(deadline)
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionBatch] = {
    val pending = if (buf.exists()) buf.get().toVector else Vector.empty[Event]
    if (pending.isEmpty) Iterator.empty
    else {
      buf.clear()
      curTimer.clear()
      Iterator.single(toBatch(key, pending))
    }
  }
}
