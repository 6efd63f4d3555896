package graft.tools

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest throughput probe (VERDICT r10 #7): the dedup-at-
  * ingest twins have parity evidence (StreamingParitySpec) and state-
  * boundedness evidence (StateSoakSpec) but, before round 11, no SCALE
  * measurement. This drives each twin over a probe corpus as a real
  * file-based stream — `readStream.parquet` with `maxFilesPerTrigger`,
  * the lakehouse-ingest shape — against the `noop` sink, and records
  * per micro-batch: input rows, trigger wall-time, and the state-store
  * gauges (rows total/updated, commit ms, state bytes). Headline
  * numbers: rows/sec overall and per-batch state growth — a
  * superlinear per-batch trigger time as state accumulates is exactly
  * what this probe exists to catch.
  *
  * A wall-clock deadline (default 20 min per twin) bounds the run: if
  * the corpus doesn't finish in time the artifact says so
  * (`finished:false`) and reports throughput over what WAS ingested —
  * a partial measurement beats a hung probe.
  *
  * Run: sbt "runMain graft.tools.IngestProbe [srcDir] [docs|vecs|both]"
  * (default /tmp/scale100d1, both). Env: SPARK_GRAFT_PROBE_OUT
  * (artifact dir, default /tmp), SPARK_GRAFT_INGEST_FILES (files per
  * trigger, default 2), SPARK_GRAFT_INGEST_DEADLINE_SEC (default 1200).
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/scale100d1")
    val mode = args.lift(1).getOrElse("both")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/tmp")
    val mft = sys.env.getOrElse("SPARK_GRAFT_INGEST_FILES", "2")
    val deadlineSec = sys.env.getOrElse("SPARK_GRAFT_INGEST_DEADLINE_SEC", "1200").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", "false") // streaming plans
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass", // transformWithState needs RocksDB
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.numRecentProgressUpdates", "2000")
      // a long-running streaming JVM under a big heap rarely GCs, so
      // ContextCleaner never reclaims finished micro-batches' shuffle
      // files (default periodicGC is 30 min) — they accumulate on disk
      // for the whole run. One-minute periodic GC bounds that residue.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fileStream(table: String): DataFrame = {
      val path = s"$src/$table.parquet"
      spark.readStream
        .schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", mft)
        .parquet(path)
    }

    /** Run one twin to completion or deadline; return the JSON fragment.
      * The checkpoint (RocksDB state — 18 GB for the docs twin at 1000×)
      * is deleted afterwards: a leaked per-run checkpoint filled the
      * probe disk and failed the NEXT twin's shuffle with ENOSPC. */
    // SPARK_GRAFT_INGEST_COUNT_PAIRS=true swaps the noop sink for a
    // counting foreachBatch, so a maxBucket sweep reports the PAIR
    // OUTPUT each cap actually produced — the completeness axis of the
    // completeness/throughput frontier (VERDICT r12 #5), not just the
    // cost axis. The count action re-runs each micro-batch's plan tail,
    // so throughput numbers from counting runs are not comparable with
    // noop runs; the artifact records which mode ran.
    val countPairs = sys.env.get("SPARK_GRAFT_INGEST_COUNT_PAIRS").exists(_.toBoolean)
    def drive(name: String, out: DataFrame): String = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"ingest_$name").toString
      val pairCount = new java.util.concurrent.atomic.AtomicLong(-1L)
      val w0 =
        if (countPairs) {
          pairCount.set(0L)
          out.writeStream.foreachBatch { (b: DataFrame, _: Long) =>
            pairCount.addAndGet(b.count()); ()
          }
        } else out.writeStream.format("noop")
      val q = w0
        .option("checkpointLocation", ckpt).outputMode("update").start()
      val done = new CountDownLatch(1)
      val worker = new Thread(() => {
        try q.processAllAvailable()
        catch { case _: Throwable => () } // surfaced via q.exception below
        finally done.countDown()
      })
      worker.setDaemon(true)
      val t0 = System.nanoTime()
      worker.start()
      val returned = done.await(deadlineSec, TimeUnit.SECONDS)
      val wallSec = (System.nanoTime() - t0) / 1e9
      val err = q.exception.map(_.cause.toString.take(200))
      // `finished` means the stream actually DRAINED the corpus: an
      // aborted run also returns from processAllAvailable (VERDICT r11
      // #1 — the 1000× uncapped artifact self-reported success on a
      // stage failure), so an error always negates it
      val finished = returned && err.isEmpty
      q.stop()
      locally { // reap the checkpoint before the next twin runs
        def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
        rm(new java.io.File(ckpt))
      }
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0).sortBy(_.batchId)
      val rows = prog.map(_.numInputRows).sum
      val trigMs = prog.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong).sum
      val rps = if (trigMs > 0) rows * 1000.0 / trigMs else 0.0
      val batches = prog.map { p =>
        val st = p.stateOperators.toSeq
        f"""{"batch":${p.batchId},"rows":${p.numInputRows},""" +
          f""""ms":${p.durationMs.getOrDefault("triggerExecution", 0L)},""" +
          f""""stateRows":${st.map(_.numRowsTotal).sum},""" +
          f""""stateBytes":${st.map(_.memoryUsedBytes).sum},""" +
          f""""commitMs":${st.map(_.commitTimeMs).sum}}"""
      }.mkString(",")
      println(f"INGEST $name%-5s rows=$rows%,d in $wallSec%.1f s wall " +
        f"($rps%,.0f rows/s of trigger time), ${prog.size} batches, " +
        f"finished=$finished${err.map(e => s" ERROR $e").getOrElse("")}")
      f""""$name":{"rows":$rows,"wall_sec":$wallSec%.1f,"rows_per_sec":$rps%.0f,""" +
        f""""finished":$finished,"files_per_trigger":$mft,""" +
        (if (countPairs) s""""pairs":${pairCount.get},""" else "") +
        err.map(e => s""""error":"${e.replace("\"", "'")}",""").getOrElse("") +
        f""""batches":[$batches]}"""
    }

    // Land each verification store as a table BUCKETED ON ITS JOIN KEY
    // before streaming: a stream-static join re-plans per micro-batch,
    // and with a plain (persisted) store both SMJ sides exchange EVERY
    // batch — the store's shuffle files accumulate until JVM exit and
    // filled the probe disk at 1000× (2M vectors × ~3 GB/batch →
    // ENOSPC at batch 14). Bucketed on the key, the store scan
    // satisfies the join's distribution+ordering as-is: per-batch disk
    // is the small candidate-side shuffle only. This is the lakehouse
    // shape a 100 TB deployment serves verification from anyway.
    def landStore(name: String, key: String)(df: => DataFrame): DataFrame = {
      val suffix = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      graft.sources.Lakehouse.landBucketed(
        spark, s"graft_ingstore_${name}_$suffix", Seq(key), 32,
        s"ingstore|v1|$name|$src")(df)
    }

    // SPARK_GRAFT_INGEST_MAXBUCKET (default: each twin's own) bounds
    // per-bucket membership in BOTH twins: on a corpus with high
    // intrinsic pair density (this fixture: batch dd7 finds 57.6M pairs
    // at 2M vectors) an UNCAPPED twin's per-batch verification work
    // grows with bucket occupancy — measured 6 s → 59 s/batch across a
    // 2M-vector run before it ABORTED on a stage failure (the
    // capped/uncapped frontier artifact). The cap is the engine's
    // documented knob for pair-density-bounded ingest (candidates carry
    // OverflowD1 markers for audit).
    val maxBucket = sys.env.get("SPARK_GRAFT_INGEST_MAXBUCKET").map(_.toInt)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    if (mode == "docs" || mode == "both") {
      // text twin: full dd3 path — signatures, banding, bucket state,
      // content-store verification against the corpus's gram sets
      val store = landStore("grams", "doc_id")(graft.operators.Dedup.gramSets(spark, src))
      parts += drive("docs", graft.streaming.DedupStream.verifiedPairs(
        fileStream("documents").select(col("doc_id"), col("text")), store,
        maxBucket = maxBucket.getOrElse(graft.streaming.LshBucketProcessor.DefaultMaxBucket)))
    }
    if (mode == "vecs" || mode == "both") {
      // embedding twin: full dd7 path — two-level assignment, cell
      // state, exact-cosine verification against the normalized corpus
      val store = landStore("normed", "vec_id")(graft.operators.Similarity.normed(spark, src))
      parts += drive("vecs", graft.streaming.EmbedDedupStream.verifiedPairs(
        fileStream("embeddings").select(col("vec_id"), col("embedding")), store,
        maxBucket = maxBucket.getOrElse(Int.MaxValue)))
    }
    locally { java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir)); () }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/ingest.json"),
      s"""{"src":"$src","max_bucket":${maxBucket.map(_.toString).getOrElse("\"default\"")},""" +
        s"""${parts.mkString(",")}}\n""")
    println(s"INGEST artifact $outDir/ingest.json")
    spark.stop()
  }
}
