package graft.streaming

import graft.functions.TopKBuf

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One ranked member of a group's streamed reservoir. */
final case class RsRow(event_type: String, rank: Int, event_id: Long, prio: Long)

/** The persisted reservoir: parallel (prio, id) arrays in rank order —
  * k entries at most, so a group's whole state is a few hundred bytes
  * no matter how many records flowed through it. */
final case class RsState(prios: Array[Long], ids: Array[Long])

object ReservoirProcessor {
  /** Flush sentinel: an event with a NEGATIVE event_id (real fixture ids
    * are non-negative) triggers emission of its key's current reservoir
    * instead of being sampled — the punctuator analog, harness-driven
    * like BatchByKeyProcessor's `__flush`. It rides the normal
    * event_type key so it routes to the group it flushes. */
  def isFlush(e: Event): Boolean = e.event_id < 0L

  /** Priority = first 48 bits of md5(event_id) — EXACTLY q49's
    * `conv(substring(md5(cast(event_id as string)), 1, 12), 16, 10)`:
    * the first 12 hex chars are the first 6 digest bytes big-endian,
    * assembled directly (no hex round-trip). The digest instance is
    * thread-local and reset per call — this sits on the streaming hot
    * path, one call per record. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def priority(eventId: Long): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(String.valueOf(eventId).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }
}

/** Streaming reservoir sample — the stream twin of q49, completing the
  * sampling surface's stream/batch duality (as the CmsProcessor did for
  * q46 and append-mode suppress did for q44). Keeps the k
  * smallest-priority (prio, event_id) pairs per group in ValueState via
  * the same TopKBuf the batch TopKAgg uses (score = −prio, ties by id —
  * identical order, identical merge semantics), so after full replay
  * the streamed reservoir IS the batch sample, row for row.
  *
  * This is the classic distributed-reservoir merge property expressed
  * as state: offering a record is TopKBuf.offer, merging days of
  * history is TopKBuf.absorb, and both are order-insensitive — which is
  * why the stream twin needs no re-sort and no retraction. */
class ReservoirProcessor(k: Int) extends StatefulProcessor[String, Event, RsRow] {
  @transient private var state: ValueState[RsState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[RsState]("rs", Encoders.product[RsState], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[Event],
      timerValues: TimerValues): Iterator[RsRow] = {
    val buf = new TopKBuf(k)
    if (state.exists()) {
      val s = state.get()
      var i = 0
      while (i < s.prios.length) { buf.offer(-s.prios(i).toDouble, s.ids(i)); i += 1 }
    }
    var flush = false
    rows.foreach { e =>
      if (ReservoirProcessor.isFlush(e)) flush = true
      else buf.offer(-ReservoirProcessor.priority(e.event_id).toDouble, e.event_id)
    }
    state.update(RsState(
      Array.tabulate(buf.size)(i => (-buf.scores(i)).toLong),
      Array.tabulate(buf.size)(i => buf.ids(i))))
    if (!flush) Iterator.empty
    else (0 until buf.size).iterator.map { i =>
      RsRow(key, i + 1, buf.ids(i), (-buf.scores(i)).toLong)
    }
  }
}
