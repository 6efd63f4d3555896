package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded / feature-extracted via partition-local
  * batch functions.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (it "decodes" dimensions from the
  * payload bytes); everything around it — the binary column, the typed
  * metadata schema, the mapPartitions batch shape, the partition-local
  * (no-shuffle) execution — is the real Spark plumbing a production
  * decode (e.g. a JNI codec or Pandas-UDF batch) would drop into.
  *
  * Scale: decode is a narrow transformation — each executor decodes its
  * own partition's blobs; metadata-only queries (mm1) never touch the
  * payload column thanks to parquet column pruning.
  */
object Multimodal {

  /** Typed metadata the stub "decoder" emits per media blob. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      n_frames: Int)

  /** DETERMINISTIC FAKE decode — stands in for a real image/video codec
    * (none available in this container). Derives pretend dimensions from
    * the payload length; a real implementation would parse the header. */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = 16 + n % 64,
      height = 16 + (n / 64) % 64,
      channels = 3,
      n_frames = 1 + n / 256)
  }

  /** The media table: documents' text re-materialized as a binary payload
    * column (the fixture set has no native blobs). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Batch decode over partitions — the mapPartitions seam where a real
    * codec (or an Arrow/Pandas batch UDF) plugs in. */
  def decoded(s: SparkSession, d: String): Dataset[MediaMeta] = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("doc_id").as[Long], col("payload").as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Deterministic fake frame-sampling: byte offsets of every 256-byte
    * "frame", capped at 4 samples — exercises array-typed results. The
    * offsets array is serialized to a comma-joined string so the driver's
    * row comparator (which cannot hash array cells) can grade it. */
  def sampleFrames(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("frame_offsets",
        array_join(
          expr("transform(sequence(0, least(CAST(n_bytes / 256 AS INT), 3)), i -> i * 256)"),
          ","))
      .select(col("doc_id"), col("n_bytes"), col("frame_offsets"))

  /** mm1 — decode + feature-extract through the binary pipeline; the
    * oracle replays the stub's arithmetic on byte lengths. */
  val mm1 = QueryDef(
    "mm1_media_decode",
    (s, d) => decoded(s, d).toDF(),
    Some("""SELECT doc_id,
           |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           |  CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
           |  CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
           |  3 AS channels,
           |  CAST(1 + octet_length(encode(text)) // 256 AS INTEGER) AS n_frames
           |FROM documents""".stripMargin)
  )

  /** mm2 — frame sampling (array-typed features from binary payloads). */
  val mm2 = QueryDef(
    "mm2_media_frames",
    (s, d) => sampleFrames(s, d),
    Some("""SELECT doc_id,
           |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           |  array_to_string(
           |    list_transform(range(0, least(octet_length(encode(text)) // 256, 3) + 1),
           |                   i -> CAST(i * 256 AS INTEGER)), ',') AS frame_offsets
           |FROM documents""".stripMargin)
  )

  val all: Seq[QueryDef] = Seq(mm1, mm2)
}
