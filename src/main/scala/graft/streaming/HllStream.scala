package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One HLL observation: register bucket and 1-based first-1-bit
  * position — produced by [[graft.operators.Relational.hllRows]], the
  * same construction batch q53 ships. Keyed by a constant shard id so
  * the parity harness can route everything through one state partition;
  * a production deployment shards by `bucket % nShards` the same way the
  * CMS twin shards by sketch row. */
final case class HllIn(shard: Int, bucket: Long, rho: Int)

/** One raised register of the streamed sketch. */
final case class HllReg(bucket: Long, rho: Int)

/** Streaming HyperLogLog — the stream twin of batch q53. Registers live
  * in MapState (bucket → max rho), merged per microbatch with the
  * max-merge that makes HLL mergeable; like the Bloom twin, registers
  * are monotone, so only RAISED registers are emitted and the
  * max-per-bucket of all emissions IS the sketch. State is bounded at
  * HllM registers regardless of stream volume. */
class HllProcessor extends StatefulProcessor[Int, HllIn, HllReg] {
  @transient private var regs: MapState[Long, Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    regs = getHandle.getMapState[Long, Int](
      "hll", Encoders.scalaLong, Encoders.scalaInt, TTLConfig.NONE)

  override def handleInputRows(
      key: Int,
      rows: Iterator[HllIn],
      timerValues: TimerValues): Iterator[HllReg] = {
    val delta = mutable.LongMap.empty[Int]
    rows.foreach { in =>
      if (delta.getOrElse(in.bucket, Int.MinValue) < in.rho) delta(in.bucket) = in.rho
    }
    val raised = delta.iterator.filter { case (bucket, rho) =>
      !regs.containsKey(bucket) || regs.getValue(bucket) < rho
    }.toVector
    raised.foreach { case (bucket, rho) => regs.updateValue(bucket, rho) }
    raised.iterator.map { case (bucket, rho) => HllReg(bucket, rho) }
  }
}
