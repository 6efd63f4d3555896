package graft

import graft.streaming._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Stream==batch parity (SURVEY §7 step 3): replay the events fixture
  * through Structured Streaming in ts-ordered chunks and assert the final
  * result equals the batch answer for the same logical query — the
  * analog of the reference's differential regression harness
  * (vanilla-KS vs Responsive, e2e-test regression/).
  */
class StreamingParitySpec extends SparkSpecBase {
  import spark.implicits._

  private var qn = 0
  private def nextName(): String = { qn += 1; s"paritysink$qn" }

  lazy val sortedEvents: Vector[Event] =
    Tables.events(spark, sfDir).as[Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id)).toVector

  lazy val maxTsMs: Long = sortedEvents.map(_.ts.getTime).max

  /** A far-future event that pushes the watermark past every real
    * window so append-mode results finalize. */
  def sentinel(eventType: String): Event =
    Event(-1L, new java.sql.Timestamp(maxTsMs + 7L * 24 * 3600 * 1000), -1L,
      eventType, 0.0, "{}")

  def chunksOf(n: Int): Seq[Seq[Event]] = sortedEvents.grouped(n).toSeq

  /** Replay chunks through a streaming transform into a memory sink. */
  def runStream(
      transform: DataFrame => DataFrame,
      chunks: Seq[Seq[Event]],
      mode: String): DataFrame = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Event]
    val name = nextName()
    val q = transform(ms.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("tumbling window: streamed replay == batch (q07 semantics)") {
    val streamed = runStream(StreamOps.tumblingAgg(_), chunksOf(200) :+ Seq(sentinel("view")), "append")
      .filter(col("user_id") =!= -1L)
    val batch = StreamOps.tumblingAgg(Tables.events(spark, sfDir))
    assert(rows(streamed) == rows(batch))
  }

  test("hopping window: streamed replay == batch (q08 semantics)") {
    val streamed = runStream(StreamOps.hoppingAgg(_), chunksOf(200) :+ Seq(sentinel("view")), "append")
      .filter(col("user_id") =!= -1L)
    val batch = StreamOps.hoppingAgg(Tables.events(spark, sfDir))
    assert(rows(streamed) == rows(batch))
  }

  test("session window: streamed replay == batch (q09 semantics)") {
    val streamed = runStream(StreamOps.sessionAgg(_), chunksOf(200) :+ Seq(sentinel("view")), "append")
      .filter(col("user_id") =!= -1L)
    val batch = StreamOps.sessionAgg(Tables.events(spark, sfDir))
    assert(rows(streamed) == rows(batch))
  }

  test("dedup: streaming first-arrival keeps exactly the q14 key set") {
    val streamed = runStream(StreamOps.dedupFirst, chunksOf(200), "append")
    val batchKeys = SparkEntry.queries("q14_dedup_first")(spark, sfDir)
      .select("user_id", "event_type").collect().map(_.toSeq).toSet
    assert(streamed.select("user_id", "event_type").collect().map(_.toSeq).toSet == batchKeys)
    assert(streamed.count() == batchKeys.size)
  }

  test("interval join: streamed replay == batch q10") {
    val streamed = runStream(StreamOps.intervalJoin(_),
      chunksOf(200) :+ Seq(sentinel("purchase"), sentinel("error")), "append")
      .filter(col("user_id") =!= -1L)
    val batch = SparkEntry.queries("q10_interval_join")(spark, sfDir)
    assert(rows(streamed) == rows(batch))
  }

  test("file-source streaming (topic-replay analog): tumbling agg == batch") {
    // production-shaped source: chunks land as parquet files in a
    // directory, readStream picks each up as a microbatch (the replayable
    // topic / changelog analog — SURVEY §2.1)
    val dir = java.nio.file.Files.createTempDirectory("graft-filesrc").toString
    val stream = spark.readStream
      .schema(Tables.events(spark, sfDir).schema)
      .parquet(dir)
    val q = StreamOps.tumblingAgg(stream).writeStream
      .format("memory").queryName("filesink").outputMode("append").start()
    try {
      (chunksOf(250) :+ Seq(sentinel("view"))).foreach { c =>
        c.toDS().toDF().coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("filesink").filter(col("user_id") =!= -1L)
    val batch = StreamOps.tumblingAgg(Tables.events(spark, sfDir))
    assert(rows(streamed) == rows(batch))
  }

  test("dropDuplicatesWithinWatermark: bounded-state dedup keeps the q14 key set") {
    // the TTL'd fact store: a key's dedup state evicts once the watermark
    // passes its event time + delay, so state stays bounded; keys seen
    // again beyond the horizon may re-emit (the deliberate trade-off), so
    // the invariant checked is key-set equality with exact dedup
    val dedup = (df: org.apache.spark.sql.DataFrame) =>
      df.withWatermark("ts", "2 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
    val streamed = runStream(dedup, chunksOf(200), "append")
    val batchKeys = SparkEntry.queries("q14_dedup_first")(spark, sfDir)
      .select("user_id", "event_type").collect().map(_.toSeq).toSet
    assert(streamed.collect().map(_.toSeq).toSet == batchKeys)
  }

  test("stream-static enrichment (GlobalKTable analog): streamed == batch") {
    val dim = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct()
      .withColumn("segment", col("user_id") % 3)
    val enrich = (df: org.apache.spark.sql.DataFrame) =>
      StreamOps.enrich(df, dim, "user_id")
        .select(col("event_id"), col("user_id"), col("segment"))
    val streamed = runStream(enrich, chunksOf(200), "append")
    val batch = enrich(Tables.events(spark, sfDir))
    assert(rows(streamed) == rows(batch))
  }

  test("left-outer interval join: streamed replay == batch q29") {
    val streamed = runStream(StreamOps.intervalJoin(_, joinType = "left_outer"),
      chunksOf(200) :+ Seq(sentinel("purchase"), sentinel("error")), "append")
      .filter(col("user_id") =!= -1L)
    val batch = SparkEntry.queries("q29_interval_left_join")(spark, sfDir)
    assert(rows(streamed) == rows(batch))
  }

  test("KV store with read-time TTL: final state == q12 batch oracle") {
    val streamed = runStream(
      df => df.as[Event].groupByKey(_.user_id)
        .transformWithState(new KvStoreProcessor, TimeMode.None(), OutputMode.Update(),
          org.apache.spark.sql.Encoders.product[KvRow])
        .toDF(),
      chunksOf(200), "update")
    // final state = per key the row with max (ts_sec, event_id); TTL is
    // enforced at read (6h against final stream time), like the
    // reference's get(key, streamTimeMs).
    val finalRows = streamed.as[KvRow].collect()
      .groupBy(_.user_id)
      .map { case (_, rs) => rs.maxBy(r => (r.ts_sec, r.event_id)) }
      .filter(_.ts_sec >= maxTsMs / 1000 - 6 * 3600)
      .map(r => Seq(r.user_id, r.event_id, math.rint(r.value * 100) / 100, r.ts_sec))
      .toSet
    val batch = SparkEntry.queries("q12_ttl_default")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(finalRows == batch)
  }

  test("as-of enrichment: per-key carry-forward state == q36 batch") {
    val streamed = runStream(
      df => df.as[Event].groupByKey(_.user_id)
        .transformWithState(new AsofEnrichProcessor, TimeMode.None(), OutputMode.Append(),
          org.apache.spark.sql.Encoders.product[AsofRow])
        .toDF(),
      chunksOf(200), "append")
    val batch = SparkEntry.queries("q36_asof_join")(spark, sfDir)
    assert(rows(streamed) == rows(batch))
  }

  test("event-time timers: SessionFlushProcessor == q09 session windows") {
    val streamed = runStream(
      df => df.withWatermark("ts", "10 minutes").as[Event].groupByKey(_.user_id)
        .transformWithState(new SessionFlushProcessor(30 * 60 * 1000L),
          TimeMode.EventTime(), OutputMode.Append(),
          org.apache.spark.sql.Encoders.product[SessionBatch])
        .toDF(),
      chunksOf(200) :+ Seq(sentinel("view")), "append")
      .filter(col("user_id") =!= -1L)
    val batch = SparkEntry.queries("q09_session_window")(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    val got = streamed.as[SessionBatch].collect()
      .map(b => (b.user_id, b.session_start, b.n, b.sum_value)).toSet
    // sums: rint (processor) vs HALF_UP round (oracle) can differ at exact
    // midpoints; compare counts exactly, sums with tolerance
    assert(got.map(t => (t._1, t._2, t._3)) == batch.map(t => (t._1, t._2, t._3)))
    val gotSums = got.toSeq.sortBy(t => (t._1, t._2)).map(_._4)
    val wantSums = batch.toSeq.sortBy(t => (t._1, t._2)).map(_._4)
    assert(gotSums.zip(wantSums).forall { case (a, b) => math.abs(a - b) < 0.011 })
  }

  test("batch-by-key with flush trigger: streamed == q22 batch oracle") {
    val users = sortedEvents.map(_.user_id).distinct
    val flushes = users.map(u =>
      Event(-100 - u, new java.sql.Timestamp(maxTsMs + 3600 * 1000), u, "__flush", 0.0, "{}"))
    val streamed = runStream(
      df => df.as[Event].groupByKey(_.user_id)
        .transformWithState(new BatchByKeyProcessor(20), TimeMode.None(), OutputMode.Append(),
          org.apache.spark.sql.Encoders.product[KeyBatch])
        .toDF(),
      chunksOf(200) :+ flushes, "append")
    val got = streamed.as[KeyBatch].collect()
      .map(b => (b.user_id, b.batch_id) -> b).toMap
    val want = SparkEntry.queries("q22_batch_by_key")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("batch_id")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"),
          r.getAs[Long]("first_event"), r.getAs[Long]("last_event"))).toMap
    assert(got.keySet == want.keySet)
    for ((k, (n, sum, first, last)) <- want) {
      val b = got(k)
      assert(b.n_events == n && b.first_event == first && b.last_event == last,
        s"batch $k mismatch: $b vs ($n,$sum,$first,$last)")
      assert(math.abs(b.sum_value - sum) < 0.011, s"batch $k sum: ${b.sum_value} vs $sum")
    }
  }
}
