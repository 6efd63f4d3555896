package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry-graded streaming twins: replay the fixture through a REAL
  * Structured Streaming query (MemoryStream source → watermarked state
  * → append-mode memory sink) and return the sink table, so the
  * driver's DuckDB oracle grades the STREAMING execution path — not
  * just the batch plan the other registry entries exercise. This is
  * the registry-level analog of the reference's differential
  * regression harness (vanilla-vs-Responsive e2e,
  * kafka-client-examples/e2e-test/src/main/java/dev/responsive/examples/regression/),
  * which replays the same records through both engines and diffs:
  * here the "two engines" are Spark's micro-batch streaming runtime
  * and DuckDB's batch SQL over the same rows.
  *
  * The replay driver collects the fixture to feed MemoryStream chunk
  * by chunk — the ResponsiveTopologyTestDriver shape (in-process
  * record feeding, responsive-test-utils/.../ResponsiveTopologyTestDriver.java:47),
  * bounded by the graded fixture. It is NOT a production ingest
  * pattern (production is readStream via [[Topics]]); `scalePath =
  * false` keeps the scale probes off it.
  */
object StreamTwins {

  /** Chunks per replay: > 1 so windows span micro-batch boundaries and
    * cross-batch state restore/merge is actually exercised; bounded so
    * per-batch runtime overhead stays O(1) in fixture size. */
  val ReplayChunks = 4

  private def replayEvents(
      s: SparkSession, d: String, transform: DataFrame => DataFrame): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, d).as[Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id)).toVector
    val maxTs = evs.map(_.ts.getTime).max
    // a far-future sentinel pushes the watermark past every real
    // window so append mode finalizes them all (suppress-until-close
    // flush) — filtered back out of the graded result
    val sentinel = Event(-1L,
      new java.sql.Timestamp(maxTs + 7L * 24 * 3600 * 1000), -1L, "view", 0.0, "{}")
    val chunkSize = math.max(1, (evs.size + ReplayChunks - 1) / ReplayChunks)
    // fixture-scale state fits a handful of partitions; 4 keeps the
    // replay's per-batch store cost ~flat vs the 32-partition default
    // (~8× fewer RocksDB opens+commits per micro-batch)
    val h = TopologyTestHarness[Event](s, transform, "append", statePartitions = Some(4))
    try (evs.grouped(chunkSize).toSeq :+ Vector(sentinel)).foreach(h.pipe)
    finally h.close()
    h.results().filter(col("user_id") =!= -1L)
  }

  /** q07's tumbling aggregation executed by the streaming runtime —
    * same oracle, so CORRECTNESS fails if the streamed state machinery
    * (watermark advance, window eviction, cross-batch merge) ever
    * diverges from the batch answer. */
  val q07s = QueryDef(
    "q07s_tumbling_stream",
    (s, d) => replayEvents(s, d, StreamOps.tumblingAgg(_)),
    graft.operators.WindowedAgg.q07.oracle,
    doc = "q07 replayed through MemoryStream + watermarked append sink: oracle-grades the streaming path",
    scalePath = false
  )

  /** q09's session windows through the streaming runtime: exercises
    * the session-merge state machinery (gap-based window growth,
    * cross-batch session extension, watermark finalization) against
    * the same DuckDB oracle as batch q09. */
  val q09s = QueryDef(
    "q09s_session_stream",
    (s, d) => replayEvents(s, d, StreamOps.sessionAgg(_)),
    graft.operators.WindowedAgg.q09.oracle,
    doc = "q09 session windows replayed through the streaming runtime: oracle-grades session-merge state",
    scalePath = false
  )

  /** The documents fixture replayed id-ordered through the dedup-at-
    * ingest engine ([[DedupStream.verifiedPairs]]: per-row MinHash
    * signatures, LSH bucket state, stream-static Jaccard verify),
    * graded by dd3's DuckDB oracle. The stream may re-emit a pair once
    * per colliding band (batch distinct()s), so the sink is distinct'd
    * — values are bit-identical by the signature/verify parity law. */
  private def replayDocs(
      s: SparkSession, d: String, transform: DataFrame => DataFrame): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).toVector
    val chunkSize = math.max(1, (docs.size + ReplayChunks - 1) / ReplayChunks)
    val h = TopologyTestHarness[(Long, String)](
      s, df => transform(df.toDF("doc_id", "text")), "update", statePartitions = Some(4))
    try docs.grouped(chunkSize).foreach(h.pipe)
    finally h.close()
    h.results()
  }

  val dd3s = QueryDef(
    "dd3s_dedup_stream",
    (s, d) => replayDocs(s, d,
      df => DedupStream.verifiedPairs(df, graft.operators.Dedup.gramSets(s, d))).distinct(),
    graft.operators.Dedup.dd3.oracle,
    doc = "dd3 as a stream: MinHash/LSH dedup-at-ingest replay graded by the batch oracle",
    scalePath = false
  )

  val all: Seq[QueryDef] = Seq(q07s, q09s, dd3s)
}
