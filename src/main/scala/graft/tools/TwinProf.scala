package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{Event, StreamOps, TopologyTestHarness}

/** Per-micro-batch cost breakdown for the streaming replay twins (the
  * bench's dominant block): replays q07s' tumbling agg through the same
  * harness the twins use and prints each batch's
  * StreamingQueryProgress.durationMs — addBatch / commitOffsets /
  * walCommit / stateOperators commit times — so the fixed per-batch
  * overhead (RocksDB commit, checkpoint files, checksums) is visible
  * instead of inferred.
  *
  * Args: [reps] (default 3). Extra `spark.*` system properties are
  * copied onto the session conf before the stream starts, so
  * `sbt 'set run/javaOptions += "-Dspark.sql....=true"' run...` A/Bs a
  * state-store conf in one command.
  */
object TwinProf {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val parts = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    sys.props.filterKeys(_.startsWith("spark.sql.streaming")).foreach {
      case (k, v) => spark.conf.set(k, v); println(s"[twinprof] conf $k=$v")
    }
    import spark.implicits._
    val evs = graft.Tables.events(spark, sfDir).as[Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id)).toVector
    val maxTs = evs.map(_.ts.getTime).max
    val sentinel = Event(-1L,
      new java.sql.Timestamp(maxTs + 7L * 24 * 3600 * 1000), -1L, "view", 0.0, "{}")
    val chunks = 2
    val chunkSize = math.max(1, (evs.size + chunks - 1) / chunks)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val h = TopologyTestHarness[Event](spark, StreamOps.tumblingAgg(_), "append",
        statePartitions = Some(parts))
      val tStart = System.nanoTime()
      var tFeed = 0L
      try (evs.grouped(chunkSize).toSeq :+ Vector(sentinel)).foreach { c =>
        val f0 = System.nanoTime(); h.pipe(c); tFeed += System.nanoTime() - f0
      } finally {
        val q = h.results() // force nothing; just read table at end
        val c0 = System.nanoTime()
        h.close()
        val n = q.filter(col("user_id") =!= -1L).count()
        println(f"[twinprof] rep$r total=${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"start=${(tStart - t0) / 1e9}%.2f feed=${tFeed / 1e9}%.2f " +
          f"close=${(System.nanoTime() - c0) / 1e9}%.2f rows=$n")
      }
    }
    // one more instrumented run: print per-batch durations
    val h = TopologyTestHarness[Event](spark, StreamOps.tumblingAgg(_), "append",
      statePartitions = Some(parts))
    try (evs.grouped(chunkSize).toSeq :+ Vector(sentinel)).foreach(h.pipe)
    finally {
      val q = hQuery(h)
      q.recentProgress.foreach { p =>
        println(s"[twinprof] batch=${p.batchId} durationMs=${p.durationMs} " +
          s"stateOps=${p.stateOperators.map(so =>
            s"commitMs=${so.commitTimeMs} rows=${so.numRowsTotal}").mkString(";")}")
      }
      h.close()
    }
    spark.stop()
  }

  private def hQuery(h: TopologyTestHarness[_]): org.apache.spark.sql.streaming.StreamingQuery = {
    val f = h.getClass.getDeclaredField("query")
    f.setAccessible(true)
    f.get(h).asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
  }
}
