package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Deterministic topology test driver — the analog of the reference's
  * `ResponsiveTopologyTestDriver`
  * (/root/reference/responsive-test-utils/src/main/java/dev/responsive/kafka/api/ResponsiveTopologyTestDriver.java:47):
  * drive a stream transform with hand-fed record chunks and read back
  * results, without standing up Kafka. Unlike the reference's driver —
  * which swaps in simulated time and in-memory stores — this one runs
  * the transform through a REAL Structured Streaming query (MemoryStream
  * source, memory sink, real state store provider), so what the test
  * exercises is exactly what production runs; `pipe` blocks until the
  * fed chunk is fully processed (the driver's synchronous-advance
  * contract).
  *
  * Used by the engine's own parity suite (StreamingParitySpec) and
  * public for engine users porting reference topology tests:
  *
  * {{{
  * val h = TopologyTestHarness[Event](spark, df => StreamOps.tumblingAgg(df), "append")
  * chunks.foreach(h.pipe)
  * val out = h.results()   // read any time; accumulates per output mode
  * h.close()
  * }}}
  */
final class TopologyTestHarness[T: Encoder] private (
    spark: SparkSession,
    transform: DataFrame => DataFrame,
    outputMode: String,
    name: String,
    statePartitions: Option[Int]) {

  private implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val source = MemoryStream[T]
  // A streaming query pins its state-partition count from
  // spark.sql.shuffle.partitions AT START (cloned into the query's
  // isolated session) — per-store cost is per partition per batch, so
  // a fixture-scale replay over the session default (one per core)
  // pays ~32 RocksDB opens+commits per stateful operator per
  // micro-batch for state that fits in a handful. `statePartitions`
  // scopes a smaller count to THIS query: set before start, restored
  // right after (start clones the conf; later batches keep the pinned
  // value), leaving the session untouched for everything else.
  private val query = {
    val key = "spark.sql.shuffle.partitions"
    val prev = statePartitions.map(_ => spark.conf.get(key))
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try transform(source.toDF()).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    finally prev.foreach(spark.conf.set(key, _))
  }

  /** Feed one chunk and block until it is fully processed. */
  def pipe(chunk: Seq[T]): this.type = {
    source.addData(chunk)
    query.processAllAvailable()
    this
  }

  /** Everything the sink has received so far (append: all emitted rows;
    * update: one row per emission — compact per key downstream). */
  def results(): DataFrame = spark.table(name)

  def close(): Unit = query.stop()
}

object TopologyTestHarness {
  private val counter = new AtomicInteger(0)

  def apply[T: Encoder](
      spark: SparkSession,
      transform: DataFrame => DataFrame,
      outputMode: String = "update",
      statePartitions: Option[Int] = None): TopologyTestHarness[T] =
    new TopologyTestHarness[T](
      spark, transform, outputMode, s"graft_harness_${counter.incrementAndGet()}",
      statePartitions)
}
