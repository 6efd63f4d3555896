package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Also attaches
  * the engine's MetricsListener with source taps on
  * (Metrics.TapSourcesKey), so every query's origin-event accounting
  * (rows-IN at the scans, pre-filter — the OriginEventTracker analog)
  * lands beside the correctness artifacts in metrics.json. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val listener = Metrics.attach(spark)
    spark.conf.set(Metrics.TapSourcesKey, "true")
    val perQuery = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    // The listener bus is async: a query's completion event can arrive
    // AFTER the next query starts, mis-attributing its metrics. Wait for
    // the event stream to go quiet (and, post-run, to have grown) before
    // cutting each query's window.
    def quiesce(minSize: Int, timeoutNs: Long): Seq[QueryMetric] = {
      val deadline = System.nanoTime() + timeoutNs
      var snap = listener.snapshot()
      var size = snap.size
      var stableSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
             (snap.size < minSize || System.nanoTime() - stableSince < 150000000L)) {
        Thread.sleep(15)
        snap = listener.snapshot()
        if (snap.size != size) { size = snap.size; stableSince = System.nanoTime() }
      }
      snap
    }
    // Sorted by name so memoized shared work lands on the same query
    // every run (comparable timings, deterministic logs).
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = quiesce(0, 2000000000L).size
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val mine = quiesce(before + 1, 3000000000L).drop(before)
        val origin = mine.reverse.collectFirst {
          case m if m.originRows >= 0 => m.originRows
        }.getOrElse(-1L)
        val out = mine.reverse.collectFirst {
          case m if !m.failed && m.outputRows >= 0 => m.outputRows
        }.getOrElse(-1L)
        perQuery(name) = (origin, out)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // The listener bus is async and the quiesce window is a heuristic:
    // a completion event arriving after the 3 s timeout (large SF, slow
    // disk) leaves that query's window empty or bleeds it into the next
    // query's, and memoized shared work books its tapped scans to
    // whichever query materializes it first — attribution is BEST-EFFORT
    // (flagged in the artifact for downstream readers; ADVICE r8).
    val mjson = (perQuery
      .map { case (k, (o, r)) => s"${q(k)}: {\"origin_rows\": $o, \"output_rows\": $r}" }
      ++ Seq("\"_attribution\": {\"note\": \"best-effort: async-listener event windows; " +
        "memoized shared scans book to the first materializing query\"}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/metrics.json"), mjson)
    spark.stop()
  }
}
