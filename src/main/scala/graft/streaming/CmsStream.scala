package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One fanned-out sketch coordinate for an input record: sketch row `r`
  * (0..depth-1) and the record's bucket in that row. Produced by
  * [[graft.operators.Relational.cmsRows]] — the SAME construction the
  * batch q46 sketch uses, so stream and batch cannot drift. */
final case class CmsIn(r: Int, bucket: Long)

/** One live counter cell of the streamed sketch. */
final case class CmsCell(r: Int, bucket: Long, c: Long)

/** Streaming count-min sketch — the stream twin of the batch q46 CMS
  * (Relational.cmsSketch), completing the sketch family's stream/batch
  * duality the way q44 did for suppress. State is one MapState
  * (bucket → count) per sketch row, merged once per microbatch from the
  * batch's pre-counted deltas; counters only grow, so the final sketch
  * is the last emission per cell (equivalently max, since emissions are
  * monotone).
  *
  * Mirrors the reference's mergeable-commit-buffer shape: per-batch
  * deltas accumulate locally and apply to durable state once per flush
  * (commit-buffer analog, SURVEY §2.9 write batching) rather than one
  * state write per record.
  *
  * Scale: state is bounded at depth × width cells TOTAL regardless of
  * input volume — the whole sketch is ≤ 4096 longs. The per-batch
  * shuffle ships depth coordinates per event; the delta map collapses
  * them to ≤ width counter updates per row before touching RocksDB. The
  * depth-way key space bounds state-update parallelism, which is fine
  * precisely because the merge work per batch is bounded by the sketch
  * size, not the event count. */
class CmsProcessor extends StatefulProcessor[Int, CmsIn, CmsCell] {
  @transient private var cells: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cells = getHandle.getMapState[Long, Long](
      "cms", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Int,
      rows: Iterator[CmsIn],
      timerValues: TimerValues): Iterator[CmsCell] = {
    val delta = mutable.LongMap.empty[Long].withDefaultValue(0L)
    rows.foreach(in => delta(in.bucket) += 1L)
    delta.iterator.map { case (bucket, d) =>
      val next = (if (cells.containsKey(bucket)) cells.getValue(bucket) else 0L) + d
      cells.updateValue(bucket, next)
      CmsCell(key, bucket, next)
    }.toVector.iterator
  }
}
