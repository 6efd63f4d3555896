package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpecBase {
  import spark.implicits._

  // listener events are delivered asynchronously — poll for them
  private def awaitMetrics(l: MetricsListener)(p: Seq[QueryMetric] => Boolean): Seq[QueryMetric] = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var snap = l.snapshot()
    while (!p(snap) && System.nanoTime() < deadline) {
      Thread.sleep(50)
      snap = l.snapshot()
    }
    snap
  }

  test("listener records duration and output rows per completed action") {
    val l = Metrics.attach(spark)
    try {
      l.clear()
      val n = (1L to 1000L).toDF("x").filter(col("x") % 2 === 0).count()
      assert(n == 500)
      val recorded = awaitMetrics(l)(_.nonEmpty)
      assert(recorded.nonEmpty, "no metrics recorded")
      val m = recorded.last
      assert(!m.failed && m.durationNs > 0)
      assert(m.action == "count")
    } finally Metrics.detach(spark, l)
  }

  test("shuffle bytes are captured for a shuffling query") {
    val l = Metrics.attach(spark)
    try {
      l.clear()
      Tables.events(spark, sfDir).groupBy("user_id").count().collect()
      val snap = awaitMetrics(l)(_.exists(_.shuffleBytesWritten > 0))
      assert(snap.exists(_.shuffleBytesWritten > 0), s"expected shuffle bytes, got $snap")
    } finally Metrics.detach(spark, l)
  }

  test("origin-event accounting (batch): rows-in counted at the source tap") {
    val l = Metrics.attach(spark)
    try {
      l.clear()
      val events = Tables.events(spark, sfDir)
      val total = events.count()
      // heavy downstream filtering: outputRows shrinks, originRows must not
      val kept = Metrics.observeOrigin(events)
        .filter(col("event_type") === "purchase").count()
      assert(kept < total)
      val snap = awaitMetrics(l)(_.exists(_.originRows >= 0))
      val m = snap.filter(_.originRows >= 0)
      assert(m.nonEmpty, s"no origin-tapped metric recorded: $snap")
      assert(m.last.originRows == total,
        s"originRows=${m.last.originRows}, expected $total (input), output was $kept")
      // untapped queries stay unaccounted rather than wrong
      assert(snap.exists(_.originRows == -1L))
    } finally Metrics.detach(spark, l)
  }

  test("registry query reports rows-in end-to-end with source taps on (the Verify wiring)") {
    // the harness-wide form: Verify sets Metrics.TapSourcesKey, so every
    // registered query's scans carry per-source taps and the listener
    // sums them into originRows — no per-query wiring. q02 filters
    // lineitem on l_shipdate; rows-in must be the PRE-filter scan count.
    val expected = Tables.lineitem(spark, sfDir).count() // untapped count first
    val l = Metrics.attach(spark)
    try {
      spark.conf.set(Metrics.TapSourcesKey, "true")
      l.clear()
      val out = SparkEntry.queries("q02_agg")(spark, sfDir).count()
      assert(out > 0)
      val snap = awaitMetrics(l)(_.exists(_.originRows >= 0))
      val m = snap.filter(_.originRows >= 0)
      assert(m.nonEmpty, s"no origin-tapped metric recorded: $snap")
      assert(m.last.originRows == expected,
        s"originRows=${m.last.originRows}, expected $expected pre-filter lineitem rows")
    } finally {
      spark.conf.set(Metrics.TapSourcesKey, "false")
      Metrics.detach(spark, l)
    }
  }

  test("origin-event accounting (streaming): per-batch observed input counts") {
    import graft.streaming.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val events = Tables.events(spark, sfDir).as[Event].collect().toVector
    val ms = MemoryStream[Event]
    // tap at the source, then aggregate — the origin count must reflect
    // raw rows in, not post-aggregation output
    val q = Metrics.observeOrigin(ms.toDF())
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("originsink")
      .outputMode("complete").start()
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      events.grouped(250).foreach { c =>
        ms.addData(c)
        q.processAllAvailable()
        // each micro-batch's progress reports the rows that entered it
        seen += q.lastProgress.observedMetrics.get(Metrics.OriginTap).getAs[Long]("rows_in")
      }
    } finally q.stop()
    assert(seen.forall(_ == 250L), s"per-batch origin counts: $seen")
    assert(seen.sum == events.size)
  }

  test("per-store gauges: stateOperators surfaced for a transformWithState query") {
    // the reference's per-store metrics registry analog: after each
    // micro-batch, every stateful operator reports its store's row
    // count, writes, commit latency and memory — "which store is hot"
    import graft.streaming.FkJoin
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sq = spark.sqlContext
    // this test asserts the numRowsTotal gauge, which the engine's
    // write-path default (trackTotalNumberOfRows=false, r17) turns off —
    // opt this query back in (conf is read at stream start)
    val trackKey = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
    val prevTrack = spark.conf.get(trackKey)
    spark.conf.set(trackKey, "true")
    val ms = MemoryStream[FkJoin.LeftRow]
    val q = ms.toDS().groupByKey(_.pk)
      .transformWithState(new FkJoin.FkRouter(), TimeMode.None(), OutputMode.Update())
      .toDF().writeStream.format("memory").queryName("gaugesink")
      .outputMode("update").start()
    try {
      ms.addData(Seq(FkJoin.LeftRow(1, 10, "a", 1), FkJoin.LeftRow(2, 20, "b", 2)))
      q.processAllAvailable()
      ms.addData(Seq(FkJoin.LeftRow(3, 30, "c", 3)))
      q.processAllAvailable()
      val gauges = Metrics.stateStoreGauges(q)
      assert(gauges.nonEmpty, "no state-operator gauges surfaced")
      assert(gauges.forall(_.queryName == "gaugesink"))
      assert(gauges.forall(_.operatorName.nonEmpty))
      // both batches wrote state; the resident row count reaches 3 pks
      assert(gauges.map(_.numRowsUpdated).sum >= 3, s"updates: $gauges")
      assert(gauges.map(_.numRowsTotal).max == 3, s"rows-total: $gauges")
      assert(gauges.forall(_.numShufflePartitions > 0))
      // gauges are per (batch, operator): distinct batch ids observed
      assert(gauges.map(_.batchId).distinct.size >= 2)
    } finally { q.stop(); spark.conf.set(trackKey, prevTrack) }
  }
}
