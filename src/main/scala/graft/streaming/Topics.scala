package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Topic abstraction — the engine's `builder.stream(topic)` / `.to(topic)`
  * surface (reference entry point for every app:
  * kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/regression/tests/STJoinExample.java:58-59,
  * config dev.responsive.kafka.api.config.ResponsiveConfig).
  *
  * A [[Topic]] names a logical stream plus the physical transport:
  *
  *  - `kafka`  — the production transport: Spark's kafka connector with
  *    the canonical subscribe/bootstrap options and a from_json value
  *    projection (records are (key, value, timestamp) like the
  *    reference's serde seam). Requires the spark-sql-kafka connector
  *    jar on the cluster; this sandbox ships none, so the kafka branch
  *    is exercised at the option-assembly level (TopicsSpec) and fails
  *    fast with Spark's own "failed to find data source" otherwise.
  *  - `file`   — replayable directory of parquet chunks (the
  *    topic-replay analog used throughout the parity suite): each file
  *    appended becomes a microbatch, same dual-use as a broker minus
  *    the infrastructure.
  *  - `memory` — MemoryStream, driven directly by tests.
  *
  * Batch/stream duality: `read` returns the same logical schema as
  * `readStream`, so every transform in StreamOps runs against either —
  * the KStream/KTable duality the engine is built around (SURVEY §1.1).
  */
final case class Topic(
    name: String,
    format: String = "file",
    options: Map[String, String] = Map.empty)

object Topics {

  /** The canonical kafka-source options for a topic — split out so the
    * wiring is testable without a broker/connector. */
  def kafkaReaderOptions(t: Topic): Map[String, String] =
    Map(
      "subscribe" -> t.name,
      "startingOffsets" -> t.options.getOrElse("startingOffsets", "earliest"),
      "kafka.bootstrap.servers" -> t.options.getOrElse("bootstrap.servers", "localhost:9092")
    ) ++ t.options.view.filterKeys(_.startsWith("kafka.")).toMap

  /** The canonical kafka-sink options for a topic. */
  def kafkaWriterOptions(t: Topic): Map[String, String] =
    Map(
      "topic" -> t.name,
      "kafka.bootstrap.servers" -> t.options.getOrElse("bootstrap.servers", "localhost:9092")
    ) ++ t.options.view.filterKeys(_.startsWith("kafka.")).toMap

  /** Streaming read: one row per record with `schema`'s typed columns.
    * Kafka records decode via from_json on the value bytes — the serde
    * seam (reference: user Serdes; here: Catalyst json/Encoder). */
  def readStream(spark: SparkSession, t: Topic, schema: StructType): DataFrame =
    t.format match {
      case "kafka" =>
        spark.readStream.format("kafka")
          .options(kafkaReaderOptions(t))
          .load()
          .select(from_json(col("value").cast("string"), schema).as("r"))
          .select(col("r.*"))
      case "file" =>
        spark.readStream.schema(schema)
          .parquet(t.options.getOrElse("path", t.name))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported topic format '$other' (kafka|file; memory streams are test-constructed)")
    }

  /** Batch read of the same topic — stream/table duality. */
  def read(spark: SparkSession, t: Topic, schema: StructType): DataFrame =
    t.format match {
      case "file" => spark.read.schema(schema).parquet(t.options.getOrElse("path", t.name))
      case other =>
        throw new IllegalArgumentException(s"batch read unsupported for format '$other'")
    }

  /** Streaming write (`.to(topic)`): kafka sinks get the to_json value
    * projection; file sinks append parquet with a checkpoint.
    *
    * A file topic with a `partitionBy` option (comma-separated columns)
    * becomes a streaming LAKEHOUSE sink: every micro-batch appends into
    * the hive partition layout of Lakehouse.writePartitioned, so batch
    * readers prune on the partition predicate immediately — the
    * stream-to-table seam. The cost of incremental appends is sliver
    * files (a day of 5-minute batches = 288 files per partition);
    * Lakehouse.compact(inPath, outPath, target, partitionCols) is the
    * companion that rewrites the layout into size-bounded files —
    * LakehouseSpec drives the full stream → slivers → compact cycle.
    * The `_spark_metadata` commit log the sink maintains is what makes
    * the directory exactly-once for readers (only committed files are
    * listed), the checkpoint/changelog analog of SURVEY §2.9. */
  def writeStream(df: DataFrame, t: Topic): DataStreamWriter[Row] =
    t.format match {
      case "kafka" =>
        df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
          .writeStream.format("kafka")
          .options(kafkaWriterOptions(t))
      case "file" =>
        val w = df.writeStream.format("parquet")
          .option("path", t.options.getOrElse("path", t.name))
          .option("checkpointLocation",
            t.options.getOrElse("checkpointLocation", t.options.getOrElse("path", t.name) + "/_chk"))
        t.options.get("partitionBy") match {
          case Some(cols) => w.partitionBy(cols.split(',').map(_.trim): _*)
          case None => w
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported sink format '$other'")
    }
}
