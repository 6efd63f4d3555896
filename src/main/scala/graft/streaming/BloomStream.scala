package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One fanned-out Bloom coordinate: hash index `i` (0..k−1) and the
  * element's bit position in that hash's space — produced by the same
  * xxhash64(key, i) mod m construction batch q48 ships. */
final case class BloomIn(i: Int, pos: Long)

/** One newly-set bit of the streamed filter. */
final case class BloomBit(i: Int, pos: Long)

/** Streaming Bloom filter — the stream twin of batch q48, closing the
  * sketch family's stream/batch duality (CMS: CmsProcessor; reservoir:
  * ReservoirProcessor; Bloom: here). State is one MapState (pos → set)
  * per hash index; a microbatch's coordinates merge in one pass and
  * only NEWLY-set bits are emitted (the filter is monotone — bits never
  * unset — so the union of all emissions IS the filter, no
  * last-emission bookkeeping needed, and a quiet key costs nothing).
  *
  * Scale: state is bounded at k × m bits regardless of stream volume;
  * per batch at most the batch's distinct positions touch RocksDB. The
  * k-way key space bounds update parallelism, fine for the same reason
  * as the CMS twin: merge work per batch is bounded by the sketch size,
  * not the event count. */
class BloomProcessor extends StatefulProcessor[Int, BloomIn, BloomBit] {
  @transient private var bits: MapState[Long, Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bits = getHandle.getMapState[Long, Boolean](
      "bloom", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)

  override def handleInputRows(
      key: Int,
      rows: Iterator[BloomIn],
      timerValues: TimerValues): Iterator[BloomBit] = {
    val fresh = mutable.SortedSet.empty[Long]
    rows.foreach { in =>
      if (!fresh.contains(in.pos) && !bits.containsKey(in.pos)) fresh += in.pos
    }
    fresh.foreach(bits.updateValue(_, true))
    fresh.iterator.map(BloomBit(key, _))
  }
}
