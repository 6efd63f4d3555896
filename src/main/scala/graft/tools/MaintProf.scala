package graft.tools

import org.apache.spark.sql.functions._

/** Phase profiler for sim2m's maintained-index replay (round-18
  * optimization measurement): times the landing, the maintenance
  * batches and the serve separately so the fixed costs can be
  * attributed before touching anything. Mirrors
  * [[graft.streaming.StreamTwins]].replayMaintain phase by phase.
  * Args: [reps] [sfDir]. */
object MaintProf {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val S = graft.operators.Similarity
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val t0all = System.nanoTime()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val cs = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), cs)); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t, cs) =>
          if (sys.env.contains("MAINTPROF_JOBS"))
            println(f"[maintprof]   job${j.jobId}%-4d ${(System.nanoTime() - t) / 1e6}%7.1f ms  $cs  (at ${(System.nanoTime() - t0all) / 1e9}%.1f s)")
        }
    })
    for (r <- 1 to reps) {
      var t = System.nanoTime()
      var j0 = jobs.get()
      def lap(name: String): Unit = {
        val now = System.nanoTime(); val j = jobs.get()
        println(f"[maintprof] rep$r $name%-14s ${(now - t) / 1e9}%6.2f s jobs=${j - j0}")
        t = now; j0 = j
      }
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft-maintprof").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"),
        java.nio.file.Paths.get(s"$tmpRoot/embeddings.parquet"))
      lap("copy")
      val qs = s.read.parquet(s"$sfDir/embeddings.parquet")
        .filter(col("vec_id") < S.NumQueries)
        .select(col("vec_id"), col("embedding").cast("array<float>"))
        .as[(Long, Array[Float])].collect().sortBy(_._1).toVector
      lap("collectQs")
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.IndexIngest.maintainPrefixIndex(
        src.toDF().toDF("vec_id", "embedding"), tmpRoot,
        checkpointDir = Some(s"$tmpRoot/ckpt"))
      lap("landing+start")
      val InsOff = 1000000L; val Ins2Off = 2000000L; val DelN = 50L
      src.addData(qs.map { case (id, v) => (id + InsOff, v) } ++
        qs.map { case (id, v) => (id + Ins2Off, v) })
      q.processAllAvailable()
      lap("batch1")
      src.addData(qs.map { case (id, _) => (id + Ins2Off, null: Array[Float]) } ++
        (S.NumQueries until (S.NumQueries + DelN).toInt)
          .map(i => (i.toLong, null: Array[Float])) ++
        qs.map { case (id, v) => (id + InsOff, v) })
      q.processAllAvailable()
      lap("batch2")
      q.stop()
      lap("stop")
      val n = S.searchTopk(s, tmpRoot, "prefix",
          qs.map { case (id, v) => (id, v.map(_.toDouble)) })
        .select(col("qid"), col("rank"), col("neighbor_id")).count()
      lap(s"serve(n=$n)")
    }
    s.stop()
  }
}
