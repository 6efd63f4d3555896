package graft

import graft.streaming.{StreamOps, Topic, Topics}
import org.apache.spark.sql.functions._

/** The topic seam: file-transport round trip end-to-end (the replayable
  * broker analog), kafka option assembly (no broker/connector in this
  * sandbox), and stream/batch duality through one Topic definition. */
class TopicsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val schema = Tables.events(spark, sfDir).schema

  test("kafka reader/writer options assemble the canonical connector config") {
    val t = Topic("orders", "kafka",
      Map("bootstrap.servers" -> "broker1:9092,broker2:9092",
        "kafka.security.protocol" -> "SASL_SSL",
        "startingOffsets" -> "latest"))
    val r = Topics.kafkaReaderOptions(t)
    assert(r("subscribe") == "orders")
    assert(r("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(r("startingOffsets") == "latest")
    assert(r("kafka.security.protocol") == "SASL_SSL")
    val w = Topics.kafkaWriterOptions(t)
    assert(w("topic") == "orders")
    assert(w("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
  }

  test("file topic: write stream through .to(topic), read back, equals batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-topic").toString
    val out = Topic("agg-out", "file", Map("path" -> s"$dir/out"))
    val in = Topic("events-in", "file", Map("path" -> s"$dir/in"))

    // produce: land the fixture as one file "batch" on the input topic
    Tables.events(spark, sfDir).write.mode("append").parquet(s"$dir/in")

    // consume → transform → produce through the factory
    val q = Topics.writeStream(
      StreamOps.tumblingAgg(Topics.readStream(spark, in, schema)), out)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    // append-mode windows close only up to the watermark; assert the
    // emitted prefix matches the batch answer exactly
    val streamed = Topics.read(spark, out,
      StreamOps.tumblingAgg(Tables.events(spark, sfDir)).schema)
    val batch = StreamOps.tumblingAgg(Tables.events(spark, sfDir))
    val got = streamed.collect().map(_.toSeq).toSet
    val want = batch.collect().map(_.toSeq).toSet
    assert(got.subsetOf(want))
    assert(got.nonEmpty)
  }

  test("unknown format fails fast") {
    intercept[IllegalArgumentException] {
      Topics.readStream(spark, Topic("t", "carrier-pigeon"), schema)
    }
  }
}
