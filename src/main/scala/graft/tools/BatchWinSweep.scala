package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Partition-scaling sweep on the BATCH window path at the 1B decade
  * (VERDICT r13 next #4): the 1B q07-shaped batch agg ran 181 s warm
  * on 32 fixed shuffle partitions, and NOTES asserted — without
  * measuring — that this is a partial-agg SPILL floor (~30M
  * groups/partition), not a plan property. This sweep times the same
  * plan at a ladder of shuffle-partition counts (plus an AQE pass) and
  * records per-config spill bytes from the stage metrics, turning the
  * assertion into a measured scaling rule the 100-TB design can cite:
  * a 1000-executor cluster runs this exact plan with
  * partitions ≈ cores, and per-partition group cardinality — not data
  * volume — sets the memory/spill behavior.
  *
  * Run: sbt "runMain graft.tools.BatchWinSweep [prepDir]" against a
  * WinScaleProbe prep corpus (ts-sorted N× events).
  * Env: SPARK_GRAFT_SWEEP_PARTS (csv, default 32,64,128,256),
  * SPARK_GRAFT_PROBE_OUT (default /tmp).
  * Artifact: $out/batch_win_sweep.json.
  */
object BatchWinSweep {
  def main(args: Array[String]): Unit = {
    val prep = args.headOption.getOrElse("/tmp/winprobe_prep_10000")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/tmp")
    val ladder = sys.env.getOrElse("SPARK_GRAFT_SWEEP_PARTS", "32,64,128,256")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // spill gauges: sum stage-level spill bytes between marks
    val memSpill = new java.util.concurrent.atomic.AtomicLong(0L)
    val diskSpill = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        memSpill.addAndGet(s.stageInfo.taskMetrics.memoryBytesSpilled)
        diskSpill.addAndGet(s.stageInfo.taskMetrics.diskBytesSpilled)
        ()
      }
    })

    def run(parts: Int, aqe: Boolean): (Double, Long, Long, Long) = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      memSpill.set(0L); diskSpill.set(0L)
      val t0 = System.nanoTime()
      val n = graft.streaming.StreamOps
        .tumblingAgg(spark.read.parquet(prep).filter(col("user_id") =!= -1L))
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain async (the bus is private API) — a short
      // settle keeps the gauges attributable to this config's stages
      Thread.sleep(1500)
      (sec, n, memSpill.get(), diskSpill.get())
    }

    // one warm-up scan so the first ladder point isn't paying the cold
    // page-cache read the others skip
    spark.read.parquet(prep).agg(count(lit(1))).head()

    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    (ladder.map(p => (p, false)) :+ (ladder.max, true)).foreach { case (p, aqe) =>
      val (sec, n, ms, ds) = run(p, aqe)
      println(f"BATCHWIN parts=$p aqe=$aqe: $sec%.1f s, $n%,d groups, " +
        f"spill mem ${ms / 1e9}%.1f GB disk ${ds / 1e9}%.1f GB")
      rows += f"""{"parts":$p,"aqe":$aqe,"sec":${math.round(sec * 10) / 10.0},""" +
        f""""groups":$n,"mem_spill_gb":${math.round(ms / 1e8) / 10.0},""" +
        f""""disk_spill_gb":${math.round(ds / 1e8) / 10.0}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/batch_win_sweep.json"),
        s"""{"prep":"$prep","sweep":[${rows.mkString(",")}]}\n""")
    }
    spark.stop()
  }
}
