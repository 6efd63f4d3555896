package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Order-insensitive per-key checksum, the engine's analog of the
  * reference's e2e digest (AccumulatingChecksum,
  * /root/reference/kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/e2etest/,
  * folded at kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/e2etest/E2ETestApplication.java:182-197). The reference digest folds
  * Kafka offsets and is order-sensitive; Spark exposes no stable per-key
  * arrival order, so this digest is commutative (XOR of a bit-mixed id) —
  * merge-able across partials, which is exactly what a distributed agg
  * needs (documented deviation, SURVEY §7).
  *
  * The mix must stay in sync with the Q21 oracle SQL:
  * `xor(xor(x, x << 13), x >> 7)`.
  */
object XorChecksum extends Aggregator[Long, Long, Long] {
  def mix(x: Long): Long = x ^ (x << 13) ^ (x >> 7)
  override def zero: Long = 0L
  override def reduce(b: Long, a: Long): Long = b ^ mix(a)
  override def merge(b1: Long, b2: Long): Long = b1 ^ b2
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  private lazy val asUdaf = udaf(this, Encoders.scalaLong)
  def column(c: Column): Column = asUdaf(c)
}
