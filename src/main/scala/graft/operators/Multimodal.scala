package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded / feature-extracted via partition-local
  * batch functions.
  *
  * The image path is REAL: `pngTable` synthesizes a genuine PNG per
  * document (the fixture set ships no native media) and `decoded` parses
  * it back with `javax.imageio` — actual header/IDAT decode, actual
  * width/height/band-count from the image, in the same mapPartitions
  * seam a production codec (JNI, Pandas-UDF batch) would occupy.
  * `decodeStub` remains as the clearly-marked deterministic fallback for
  * payloads no installed ImageReader recognizes.
  *
  * Scale: both synthesis and decode are narrow transformations — each
  * executor handles its own partition's blobs, no shuffle; metadata-only
  * consumers never drag the payload column through the plan thanks to
  * parquet column pruning.
  */
object Multimodal {

  /** ImageIO's default stream cache is a TEMP FILE PER READ/WRITE —
    * thousands of disk create/delete cycles per partition and wildly
    * I/O-contention-dependent timings. Every codec call goes through
    * this per-JVM one-shot switch to the in-memory cache instead.
    * (Executor-side: the lazy val re-runs once per executor JVM.) */
  private lazy val imageIoInMemory: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    imageIoInMemory
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
  }

  private def writePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    imageIoInMemory
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A synthesized media blob: the source byte length rides along as
    * typed metadata (the only field the decoder cannot recover). */
  final case class MediaBlob(doc_id: Long, src_bytes: Int, payload: Array[Byte])

  /** Typed metadata the decoder emits per media blob. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      n_frames: Int)

  /** DETERMINISTIC FAKE decode — fallback for payloads ImageIO cannot
    * read. Derives pretend dimensions from the payload length; the real
    * path is `decodePng`. */
  def decodeStub(docId: Long, srcBytes: Int): MediaMeta =
    MediaMeta(
      doc_id = docId,
      n_bytes = srcBytes,
      width = 16 + srcBytes % 64,
      height = 16 + (srcBytes / 64) % 64,
      channels = 3,
      n_frames = 1)

  /** The media table: documents' text re-materialized as a binary payload
    * column (used by the frame-sampling path, mm2). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Synthesize one real PNG per document: dimensions derive
    * deterministically from the source byte length (so the DuckDB oracle
    * can predict them), pixels from the doc_id (so payloads differ).
    * This is the ingest seam — at 100 TB the payloads arrive as real
    * media instead of being synthesized, and everything downstream is
    * unchanged. */
  private val pngCache = Memo.newCache[Dataset[MediaBlob]]()

  def pngTable(s: SparkSession, d: String): Dataset[MediaBlob] =
    Memo.get(pngCache, s, d) {
      import s.implicits._
      val ds = Tables.documents(s, d)
        .select(col("doc_id").as[Long], col("text").as[String])
        .mapPartitions(_.map { case (id, text) =>
          val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
          val w = 16 + n % 64
          val h = 16 + (n / 64) % 64
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          img.setRGB(0, 0, (id & 0xffffff).toInt)
          img.setRGB(w - 1, h - 1, ((id * 2654435761L) & 0xffffff).toInt)
          MediaBlob(id, n, writePng(img))
        })
      // memoized like the dd-family intermediates: synthesized once,
      // decoded by mm1 and resized by mm3
      ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ds.count()
      ds
    }

  /** Real decode: parse the PNG with javax.imageio and report the
    * image's own width/height/band count; falls back to the documented
    * stub when no reader recognizes the payload. */
  def decodePng(blob: MediaBlob): MediaMeta = {
    val img = readImage(blob.payload)
    if (img == null) decodeStub(blob.doc_id, blob.src_bytes)
    else MediaMeta(
      doc_id = blob.doc_id,
      n_bytes = blob.src_bytes,
      width = img.getWidth,
      height = img.getHeight,
      channels = img.getRaster.getNumBands,
      n_frames = 1)
  }

  /** Rows handed to the codec per call — the Arrow-style record-batch
    * granularity (pandas UDFs default to 10k rows/batch; media payloads
    * are KBs–MBs each, so a smaller batch keeps a batch's payload bytes
    * executor-memory-friendly). */
  val DecodeBatchSize = 64

  /** One columnar micro-batch of media blobs — the Arrow RecordBatch
    * shape (one array per column, row i across arrays is one record).
    * This is the mapInPandas seam: a production vectorized codec
    * (Pandas UDF, JNI batch API) consumes exactly this layout; the
    * JVM decoders below are the in-container stand-ins. */
  final case class MediaBatch(
      docIds: Array[Long],
      srcBytes: Array[Int],
      payloads: Array[Array[Byte]])

  /** Chunk a partition's row iterator into columnar micro-batches and
    * run `f` once per batch — per-row codec overhead (context setup,
    * scratch allocation) amortizes across DecodeBatchSize rows, and the
    * batch boundary is where an Arrow FFI would hand buffers off. */
  def mapMediaBatches[R](it: Iterator[MediaBlob])(f: MediaBatch => Iterator[R]): Iterator[R] =
    it.grouped(DecodeBatchSize).flatMap { rows =>
      f(MediaBatch(
        rows.map(_.doc_id).toArray,
        rows.map(_.src_bytes).toArray,
        rows.map(_.payload).toArray))
    }

  /** Batched decode over partitions — the columnar seam where any
    * production codec plugs in. Output is identical to row-at-a-time
    * decodePng; only the call granularity changes. */
  def decoded(s: SparkSession, d: String): Dataset[MediaMeta] = {
    import s.implicits._
    pngTable(s, d).mapPartitions(mapMediaBatches(_) { batch =>
      batch.docIds.indices.iterator.map { i =>
        decodePng(MediaBlob(batch.docIds(i), batch.srcBytes(i), batch.payloads(i)))
      }
    })
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

  /** mm1 — genuine PNG decode through the binary pipeline; the oracle
    * predicts the dimensions the synthesizer baked in (width/height are
    * functions of source length, channels = 3-band BGR, single frame),
    * which the decoder must recover from the actual image bytes. */
  val mm1 = QueryDef(
    "mm1_media_decode",
    (s, d) => decoded(s, d).toDF(),
    Some("""SELECT doc_id,
           |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           |  CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
           |  CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
           |  3 AS channels,
           |  1 AS n_frames
           |FROM documents""".stripMargin)
  )

  /** A resized media blob: re-encoded thumbnail plus its decoded-back
    * dimensions (the proof the resize really happened). */
  final case class Thumb(
      doc_id: Long,
      n_bytes: Int,
      thumb_w: Int,
      thumb_h: Int,
      channels: Int,
      thumbnail: Array[Byte])

  val ThumbSize = 32

  /** Real image resize in the batched columnar seam: decode the PNG,
    * scale to ThumbSize² with Graphics2D bilinear interpolation,
    * re-encode, and decode the thumbnail BACK to report its dimensions —
    * a full codec round trip per row, no shuffle. The scratch target
    * image and its Graphics2D context are allocated ONCE per batch and
    * reused across its rows, with an explicit black reset per row so an
    * unreadable payload cannot inherit the previous row's pixels — the
    * per-row amortization the batch seam exists for. */
  def thumbnails(s: SparkSession, d: String): Dataset[Thumb] = {
    import s.implicits._
    pngTable(s, d).mapPartitions(mapMediaBatches(_) { batch =>
      val out = new java.awt.image.BufferedImage(
        ThumbSize, ThumbSize, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val gfx = out.createGraphics()
      gfx.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      val thumbs = batch.docIds.indices.map { i =>
        val img = readImage(batch.payloads(i))
        // reset the shared canvas each row: an unreadable payload (null
        // image) or a future alpha-channel source must not inherit the
        // previous row's pixels — a black thumb is the per-row-allocation
        // behavior this batch reuse replaced
        gfx.setColor(java.awt.Color.BLACK)
        gfx.fillRect(0, 0, ThumbSize, ThumbSize)
        if (img != null) gfx.drawImage(img, 0, 0, ThumbSize, ThumbSize, null)
        val bytes = writePng(out)
        val back = readImage(bytes)
        Thumb(batch.docIds(i), batch.srcBytes(i), back.getWidth, back.getHeight,
          back.getRaster.getNumBands, bytes)
      }
      gfx.dispose()
      thumbs.iterator
    })
  }

  /** mm3 — image resize: the oracle checks the deterministic metadata
    * (source length, target dims, band count); the codec round trip
    * itself is asserted in SimilaritySpec (decoded-back dimensions come
    * from the re-encoded thumbnail, not the declared target). */
  val mm3 = QueryDef(
    "mm3_media_resize",
    (s, d) => thumbnails(s, d).toDF()
      .select(col("doc_id"), col("n_bytes"), col("thumb_w"), col("thumb_h"), col("channels")),
    Some(s"""SELECT doc_id,
            |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
            |  $ThumbSize AS thumb_w, $ThumbSize AS thumb_h, 3 AS channels
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

  val all: Seq[QueryDef] = Seq(mm1, mm2, mm3)
}
