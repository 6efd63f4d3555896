package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One HLL observation tagged with its tumbling window (epoch-second
  * window start) — the per-window form of [[HllIn]], produced by the
  * same [[graft.operators.Relational.hllRows]] construction batch q54
  * ships, so stream and batch cannot drift. */
final case class WinHllIn(window_start: Long, bucket: Long, rho: Int)

/** One final register of a CLOSED window's sketch. */
final case class WinHllReg(window_start: Long, bucket: Long, rho: Int)

/** One fanned-out CMS coordinate tagged with its window — the
  * per-window form of [[CmsIn]] (same
  * [[graft.operators.Relational.cmsRows]] construction as batch q56). */
final case class WinCmsIn(window_start: Long, r: Int, bucket: Long)

/** One final counter cell of a CLOSED window's sketch. */
final case class WinCmsCell(window_start: Long, r: Int, bucket: Long, c: Long)

/** Per-window streaming HyperLogLog — the stream twin of batch q54
  * (per-hour distinct-user sketches), completing what the global
  * [[HllProcessor]] does for q53. Keyed by window start; each window
  * owns one MapState register table (bucket → max rho, ≤ HllM entries).
  *
  * Emission is suppress-until-close (the q44 semantics, and what a
  * windowed sketch means operationally): registers buffer silently
  * while the window is open and the window's FINAL register set is
  * emitted exactly once, when the event-time watermark passes
  * window end + grace — after which the state is dropped, so total
  * state is bounded by (open windows) × HllM regardless of stream
  * length or key cardinality. The event-time column is projected away
  * before the processor (the key is the window start, a plain long),
  * so Spark's own late-record filter cannot apply — the processor
  * enforces closure itself: a row arriving once the watermark has
  * passed the window's close time is dropped in handleInputRows, so a
  * closed window can never re-open, re-arm a past-due timer, or emit
  * a second partial register set.
  *
  * Reference behavior mirrored: windowed aggregation over segmented
  * window stores with retention-driven segment expiry
  * (kafka-client/src/main/java/dev/responsive/kafka/internal/db/partitioning/WindowSegmentPartitioner.java)
  * — here the watermark timer IS the segment-expiry clock.
  */
class WindowedHllProcessor(windowMs: Long, graceMs: Long)
    extends StatefulProcessor[Long, WinHllIn, WinHllReg] {
  @transient private var regs: MapState[Long, Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    regs = getHandle.getMapState[Long, Int](
      "winhll", Encoders.scalaLong, Encoders.scalaInt, TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[WinHllIn], timerValues: TimerValues): Iterator[WinHllReg] = {
    // late-row guard: once the watermark passed this window's close
    // time its timer fired and the final registers are out — a later
    // arrival must not re-create state or register a past-due timer
    // (which would emit a second partial set, breaking emit-once)
    if (timerValues.getCurrentWatermarkInMs() >= key * 1000L + windowMs + graceMs + 1L)
      return Iterator.empty
    // collapse the batch's rows to one max per bucket before touching
    // state — ≤ HllM state reads/writes per microbatch per window
    val delta = mutable.LongMap.empty[Int]
    rows.foreach { in =>
      if (delta.getOrElse(in.bucket, Int.MinValue) < in.rho) delta(in.bucket) = in.rho
    }
    delta.foreach { case (bucket, rho) =>
      if (!regs.containsKey(bucket) || regs.getValue(bucket) < rho)
        regs.updateValue(bucket, rho)
    }
    // idempotent re-arm: key is the window start (epoch s); fire once
    // the watermark is strictly past window end + grace
    getHandle.registerTimer(key * 1000L + windowMs + graceMs + 1L)
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo): Iterator[WinHllReg] = {
    val out = regs.iterator().map { case (bucket, rho) => WinHllReg(key, bucket, rho) }.toVector
    regs.clear()
    out.iterator
  }
}

/** Per-window streaming count-min sketch — the stream twin of batch q56
  * (per-hour heavy-hitter sketches), completing what the global
  * [[CmsProcessor]] does for q46. Keyed by (window start, sketch row);
  * each key owns one MapState counter row (bucket → count, ≤ width
  * entries), so state-update parallelism is (open windows) × depth
  * rather than the global twin's depth.
  *
  * Same suppress-until-close emission and watermark-timer expiry as
  * [[WindowedHllProcessor]]: counters accumulate across microbatches
  * (per-batch pre-counted deltas, the commit-buffer shape) and the
  * window's final cells emit exactly once when it closes, then the
  * state drops.
  */
class WindowedCmsProcessor(windowMs: Long, graceMs: Long)
    extends StatefulProcessor[(Long, Int), WinCmsIn, WinCmsCell] {
  @transient private var cells: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cells = getHandle.getMapState[Long, Long](
      "wincms", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: (Long, Int), rows: Iterator[WinCmsIn], timerValues: TimerValues): Iterator[WinCmsCell] = {
    // same late-row guard as WindowedHllProcessor: closed windows stay closed
    if (timerValues.getCurrentWatermarkInMs() >= key._1 * 1000L + windowMs + graceMs + 1L)
      return Iterator.empty
    val delta = mutable.LongMap.empty[Long].withDefaultValue(0L)
    rows.foreach(in => delta(in.bucket) += 1L)
    delta.foreach { case (bucket, d) =>
      val next = (if (cells.containsKey(bucket)) cells.getValue(bucket) else 0L) + d
      cells.updateValue(bucket, next)
    }
    getHandle.registerTimer(key._1 * 1000L + windowMs + graceMs + 1L)
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: (Long, Int), timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo): Iterator[WinCmsCell] = {
    val out = cells.iterator().map { case (bucket, c) => WinCmsCell(key._1, key._2, bucket, c) }.toVector
    cells.clear()
    out.iterator
  }
}
