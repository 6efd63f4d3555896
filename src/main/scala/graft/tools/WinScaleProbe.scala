package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming WINDOW-engine probe at scale: the tumbling and session
  * aggregation engines are oracle-graded through the real streaming
  * runtime at sf0.1 (q07s/q08s/q09s twins), but — unlike the FK
  * router/joiner (FKSCALE_r13), dedup-at-ingest (INGEST_r11/r13) and
  * index maintenance (MAINT_r13) — they had no at-scale measurement.
  * This probe streams an N×-events corpus through
  * [[graft.streaming.StreamOps.tumblingAgg]] /
  * [[graft.streaming.StreamOps.sessionAgg]] (watermarked built-in
  * window state over RocksDB; session is the MERGING state shape,
  * reference ResponsiveSessionStore) and records per-batch trigger
  * time + live state rows, then parity-checks the appended sink
  * against the batch plan over the same rows.
  *
  * What the artifact must show for the 100-TB argument:
  *  - **state rows PLATEAU** at ≈ users × open-windows-per-user (the
  *    watermark horizon), NOT ∝ events streamed — the reference's
  *    segment-expiry contract (ResponsiveWindowStore.java:148-152
  *    observedStreamTime − retention cutoff) maps to watermark
  *    eviction here, and bounded state is what makes a year-long
  *    stream feasible;
  *  - **per-batch cost flat** while cumulative input grows (RocksDB
  *    point upserts against the bounded live set);
  *  - **streamed == batch** on the finalized windows (append-mode
  *    discipline: every window is emitted exactly once, on watermark
  *    close).
  *
  * Event-time discipline: the N× copies all span the SAME ts range,
  * so a naive file feed would replay time N times and the watermark
  * would drop all but the first copy. The staging step sorts the N×
  * corpus globally by ts (repartitionByRange + sortWithinPartitions)
  * and feeds the range-partitioned files in range order with strictly
  * increasing modification times — within-batch disorder is fine
  * (the watermark only advances between batches), cross-batch
  * regression never happens. A far-future sentinel file closes every
  * live window at the end (the q07s flush shape).
  *
  * Run: sbt "runMain graft.tools.WinScaleProbe [N]" (default 100).
  * Env: SPARK_GRAFT_PROBE_SRC (default /root/testdata/sf0.1),
  * SPARK_GRAFT_INGEST_FILES (files/trigger, default 4),
  * SPARK_GRAFT_WIN_KINDS (csv of tumbling,session,hopping,interval;
  * default tumbling,session; interval = the q10s stream–stream join
  * engine, multiset parity), SPARK_GRAFT_WIN_ROWS_PER_FILE (batch
  * granularity, default 500k), SPARK_GRAFT_PROBE_OUT (artifact dir,
  * default /tmp). Artifact: $out/win_scale.json, flushed per phase.
  */
object WinScaleProbe {
  def main(args: Array[String]): Unit = {
    val N = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(100)
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/tmp")
    val mft = sys.env.getOrElse("SPARK_GRAFT_INGEST_FILES", "4")
    val kinds = sys.env.getOrElse("SPARK_GRAFT_WIN_KINDS", "tumbling,session")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.numRecentProgressUpdates", "2000")
      // the four 1000×-stateful-probe patterns (NOTES round-13):
      // bounded native memory, minimal retained checkpoint history
      .config("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
      .config("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB",
        sys.env.getOrElse("SPARK_GRAFT_ROCKS_MB", "16384"))
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.StreamOps

    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
    val src = sys.env.getOrElse("SPARK_GRAFT_PROBE_SRC", "/root/testdata/sf0.1")
    val prep = s"$outDir/winprobe_prep_$N"

    // ---- datagen: N× events, globally ts-sorted into range files ----
    val t0 = System.nanoTime()
    val ev = graft.Tables.events(spark, src)
    def stride(df: DataFrame, c: String): Long = {
      val mx = df.agg(max(col(c))).head().getLong(0)
      var s = 10L; while (s <= mx) s *= 10; s
    }
    val evStride = stride(ev, "event_id")
    val uStride = stride(ev, "user_id")
    val nRows = ev.count() * N
    // file granularity sets micro-batch granularity (files/trigger ×
    // rows/file): small enough files that the run spans tens of batches
    // — the state-plateau and per-batch-flatness evidence needs
    // resolution — large enough that per-batch runtime overhead doesn't
    // dominate the measurement
    val rowsPerFile = sys.env.getOrElse("SPARK_GRAFT_WIN_ROWS_PER_FILE", "500000").toLong
    val nFiles = math.max(8, math.min(2048, (nRows / rowsPerFile).toInt + 1))
    if (!new java.io.File(s"$prep/_done").exists()) {
      rm(new java.io.File(prep))
      // one broadcast cross join against the copy index — a single plan
      // whatever N is (an N-way union bloats analysis past N≈100)
      val nx = ev.crossJoin(broadcast(spark.range(N).select(col("id").as("__copy"))))
        .withColumn("event_id", col("event_id") + col("__copy") * lit(evStride))
        .withColumn("user_id", col("user_id") + col("__copy") * lit(uStride))
        .drop("__copy")
      nx.repartitionByRange(nFiles, col("ts"), col("event_id"))
        .sortWithinPartitions(col("ts"))
        .write.mode("overwrite").parquet(prep)
      new java.io.File(s"$prep/_done").createNewFile()
    }
    val datagenSec = (System.nanoTime() - t0) / 1e9
    println(f"WINSCALE datagen ${N}x = $nRows%,d rows, $nFiles files, $datagenSec%.1f s")

    val partFiles = Option(new java.io.File(prep).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName) // part-00000 holds the lowest ts range
    val maxTs = spark.read.parquet(partFiles.last.getPath)
      .agg(max(col("ts"))).head().getTimestamp(0)
    val schema = spark.read.parquet(prep).schema

    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(finished: Boolean): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/win_scale.json"),
        s"""{"n":$N,"rows":$nRows,"files":$nFiles,"files_per_trigger":$mft,""" +
          s""""shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
          f""""datagen_sec":$datagenSec%.1f,"finished":$finished,${parts.mkString(",")}}%n""")
      ()
    }

    // window-agg parity: every finalized window the stream appended must
    // equal the batch plan's row for that key. n compares exactly; the
    // 2-decimal rounded sums compare within one ulp of the rounding grid
    // (stream folds per-batch partials, batch folds per-split —
    // bit-equality would test double association, not the engine).
    def aggMismatch(keyCols: Seq[String])(streamed: DataFrame, batch: DataFrame): (Long, Long, Long) = {
      val r = streamed.as("s").join(batch.as("b"), keyCols, "full_outer")
        .select(col("s.n").as("sn"), col("b.n").as("bn"),
          (col("s.n") === col("b.n") &&
            abs(col("s.sum_value") - col("b.sum_value")) <= lit(0.011)).as("ok"))
        .agg(sum(when(!col("ok") || col("ok").isNull, 1L).otherwise(0L)),
          count(col("sn")), count(col("bn"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    // checksum parity for the 10000×/1B-row decade, where the row-level
    // full-outer join above would shuffle ~2× the corpus (tens of GB a
    // single local disk can't spare): xxhash64 over (key, n) summed per
    // side pins window membership and counts EXACTLY in one linear
    // pass; the rounded sums compare at the aggregate level (a single
    // 2-decimal midpoint flip row-level parity tolerates would trip a
    // per-row hash — aggregate tolerance keeps the check about the
    // engine, not double association). Enabled via
    // SPARK_GRAFT_WIN_PARITY=checksum.
    def checksumMismatch(keyCols: Seq[String])(streamed: DataFrame, batch: DataFrame): (Long, Long, Long) = {
      // bit_xor, not sum: xxhash64 values are uniform over the full
      // long range, so summing ~1e9 of them is a GUARANTEED
      // ARITHMETIC_OVERFLOW under ANSI mode (killed the first 10000×
      // parity pass); XOR is order-independent and overflow-free, and
      // (key, n) rows are unique per side so pair-cancellation can't
      // mask a diff
      def sig(df: DataFrame) = df.agg(
        expr(s"bit_xor(xxhash64(${(keyCols :+ "n").mkString(", ")}))").as("h"),
        count(lit(1)).as("c"), sum(col("sum_value")).as("sv")).head()
      val (s, b) = (sig(streamed), sig(batch))
      val ok = s.getLong(0) == b.getLong(0) && s.getLong(1) == b.getLong(1) &&
        math.abs(s.getDouble(2) - b.getDouble(2)) <= math.max(1.0, math.abs(b.getDouble(2)) * 1e-9)
      (if (ok) 0L else 1L, s.getLong(1), b.getLong(1))
    }
    val parityMode = sys.env.getOrElse("SPARK_GRAFT_WIN_PARITY", "join")
    def aggParity(keyCols: Seq[String]): (DataFrame, DataFrame) => (Long, Long, Long) =
      if (parityMode == "checksum") checksumMismatch(keyCols) else aggMismatch(keyCols)

    // join parity: the streamed match set is a MULTISET (duplicates
    // retained — the stream-stream window-store schema), so compare
    // per-row multiplicities, not distinct rows
    def multisetMismatch(streamed: DataFrame, batch: DataFrame): (Long, Long, Long) = {
      val s = streamed.groupBy(streamed.columns.map(col).toSeq: _*).count()
      val b = batch.groupBy(batch.columns.map(col).toSeq: _*).count()
      val r = s.as("s").join(b.as("b"), streamed.columns.toSeq, "full_outer")
        .select(col("s.count").as("sc"), col("b.count").as("bc"),
          (col("s.count") === col("b.count")).as("ok"))
        .agg(sum(when(!col("ok") || col("ok").isNull, 1L).otherwise(0L)),
          sum(coalesce(col("sc"), lit(0L))), sum(coalesce(col("bc"), lit(0L)))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    def runKind(kind: String, agg: DataFrame => DataFrame,
        mismatch: (DataFrame, DataFrame) => (Long, Long, Long)): Unit = {
      val ckpt = s"$outDir/winprobe_ckpt_$kind"
      val sink = s"$outDir/winprobe_out_$kind"
      Seq(ckpt, sink).foreach(p => rm(new java.io.File(p)))
      // stream the prep files IN PLACE (a staging copy would double the
      // corpus's disk footprint): strictly increasing mod times pin
      // FileStreamSource arrival order to ts-range order
      var stamp = System.currentTimeMillis() - partFiles.length * 2000L - 60000L
      partFiles.foreach { f => stamp += 2000L; f.setLastModified(stamp) }
      val q = agg(spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", mft).parquet(prep))
        .writeStream.outputMode("append")
        .foreachBatch((b: DataFrame, _: Long) => b.write.mode("append").parquet(sink))
        .option("checkpointLocation", ckpt).start()
      val w0 = System.nanoTime()
      q.processAllAvailable()
      val mainWall = (System.nanoTime() - w0) / 1e9
      // sentinel: one far-future row pushes the watermark past every
      // real window so append mode finalizes them all (written to a
      // scratch dir, dropped into prep under a tracked name, removed
      // after the drain so the next phase re-streams a clean corpus)
      import spark.implicits._
      val sentScratch = s"$outDir/winprobe_sent"
      rm(new java.io.File(sentScratch))
      Seq(graft.streaming.Event(-1L,
          new java.sql.Timestamp(maxTs.getTime + 7L * 24 * 3600 * 1000), -1L, "view", 0.0, "{}"))
        .toDS().toDF().coalesce(1).write.parquet(sentScratch)
      val sentSrc = new java.io.File(sentScratch).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      val sentDst = new java.io.File(prep, s"zz_sentinel_$kind.parquet")
      java.nio.file.Files.copy(sentSrc.toPath, sentDst.toPath)
      sentDst.setLastModified(System.currentTimeMillis())
      q.processAllAvailable()
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0).sortBy(_.batchId)
      q.stop()
      sentDst.delete(); rm(new java.io.File(sentScratch))
      val batches = prog.map { p =>
        s"""{"batch":${p.batchId},"rows":${p.numInputRows},""" +
          s""""ms":${p.durationMs.getOrDefault("triggerExecution", 0L)},""" +
          s""""stateRows":${p.stateOperators.toSeq.map(_.numRowsTotal).sum}}"""
      }.mkString(",")
      val peakState = prog.map(_.stateOperators.toSeq.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)

      val streamed = spark.read.parquet(sink).filter(col("user_id") =!= -1L)
      val batch = agg(spark.read.parquet(prep).filter(col("user_id") =!= -1L))
      // one execution per side: the parity fn returns (bad, sn, bn) —
      // separate .count() calls would re-run the 1B-row batch agg twice
      val (bad, sn, bn) = mismatch(streamed, batch)
      val ok = bad == 0 && sn == bn
      println(f"WINSCALE $kind: ${prog.map(_.numInputRows).sum}%,d rows in ${prog.size} " +
        f"batches, $mainWall%.1f s (${nRows / math.max(mainWall, 0.001)}%,.0f rows/s), " +
        f"peak state $peakState%,d; parity streamed=$sn%,d batch=$bn%,d mismatched=$bad " +
        (if (ok) "MATCH" else "MISMATCH"))
      parts += s""""$kind":{"wall_sec":${math.round(mainWall * 10) / 10.0},""" +
        s""""n_batches":${prog.size},"peak_state_rows":$peakState,""" +
        s""""rows_per_sec":${math.round(nRows / math.max(mainWall, 0.001))},""" +
        s""""parity":{"streamed":$sn,"batch":$bn,"mismatched":$bad,"match":$ok},""" +
        s""""batches":[$batches]}"""
      flush(finished = false)
      Seq(ckpt, sink).foreach(p => rm(new java.io.File(p)))
    }

    try {
      if (kinds.contains("tumbling"))
        runKind("tumbling", StreamOps.tumblingAgg(_),
          aggParity(Seq("window_start", "user_id")))
      if (kinds.contains("session"))
        runKind("session", StreamOps.sessionAgg(_),
          aggParity(Seq("session_start", "user_id")))
      if (kinds.contains("hopping"))
        runKind("hopping", StreamOps.hoppingAgg(_),
          aggParity(Seq("window_start", "user_id")))
      // stream–stream interval join (q10s's engine): both sides buffer
      // in the join state store within the watermark horizon; inner
      // join emits eagerly so no flush sentinel is needed for rows, but
      // the sentinel still drains the tail state for the final gauge
      if (kinds.contains("interval"))
        runKind("interval", StreamOps.intervalJoin(_), multisetMismatch)
    } finally flush(finished = true)
    println(s"WINSCALE artifact $outDir/win_scale.json")
    spark.stop()
  }
}
