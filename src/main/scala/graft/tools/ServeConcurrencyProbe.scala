package graft.tools

import java.util.concurrent.Executors
import org.apache.spark.sql.SparkSession

/** Concurrent serve-path probe (VERDICT r12 #8): every ANN serving
  * number so far is a single query batch in an idle session, but a
  * training-data pipeline issues MANY shortlist lookups at once — N
  * workers each asking "nearest neighbors of my candidate chunk". This
  * probe measures what concurrency does to the serving path: N threads
  * each issue out-of-sample `searchTopk` batches against the warm
  * landed index, and the artifact records aggregate batch/query
  * throughput plus per-call p50/p95/max latency at N ∈ {1, 8, 32}.
  *
  * What contention would look like: the per-call probe ranking is
  * driver-side arithmetic over the resident coarse anchors (shared,
  * read-only — no lock), then each call runs an independent Spark job
  * over probed cells. With FAIR scheduling the jobs interleave; a flat
  * p95 vs N means the serving path scales with offered load until the
  * executor pool saturates, a p95 blowing up faster than N means the
  * driver or scheduler is the bottleneck.
  *
  * Run: sbt "runMain graft.tools.ServeConcurrencyProbe [srcDir] [kinds...]"
  * (default /tmp/scale1000d1, kinds prefix+ivfpq). Artifact:
  * $SPARK_GRAFT_PROBE_OUT/serve_concurrency.json.
  */
object ServeConcurrencyProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/scale1000d1")
    val kinds = if (args.length > 1) args.drop(1).toSeq else Seq("prefix", "ivfpq")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/tmp")
    val levels = sys.env.get("SPARK_GRAFT_CONC_LEVELS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 8, 32))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      // FAIR: the realistic serving config — concurrent lookup jobs
      // share executors instead of queueing FIFO behind each other
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    // distinct OOS query batches (RecallProbe's controlled-cosine
    // perturbation, unique negative ids per batch so self-pair filters
    // and result sets never collide across threads)
    def perturb(seed: Long, v: Array[Double], t: Double): Array[Double] = {
      val rnd = new java.util.SplittableRandom(seed * 7919 + 17)
      val r = Array.fill(v.length)(if (rnd.nextBoolean()) 1.0 else -1.0)
      val vv = v.map(x => x * x).sum
      val rv = r.indices.map(i => r(i) * v(i)).sum
      val w = r.indices.map(i => r(i) - rv / vv * v(i)).toArray
      val ww = math.max(w.map(x => x * x).sum, 1e-12)
      val sc = math.sqrt(1 - t * t) * math.sqrt(vv / ww)
      v.indices.map(i => t * v(i) + sc * w(i)).toArray
    }
    import org.apache.spark.sql.functions.col
    val rawQs = spark.read.parquet(s"$src/embeddings.parquet")
      .filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val ts = Array(0.95, 0.85, 0.75)
    val nBatches = 32
    val batches: IndexedSeq[Seq[(Long, Array[Double])]] =
      (0 until nBatches).map { b =>
        rawQs.toSeq.map { case (id, v) =>
          (-(b.toLong * 1000 + id + 1), perturb(b * 100003L + id, v, ts((id % 3).toInt)))
        }
      }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (kind <- kinds) {
      // warm once: re-registration of the PRE-LANDED index (serving
      // fails fast with MissingIndexException if it is not landed —
      // run PreLand first), sidecar load, codegen
      Similarity.searchTopk(spark, src, kind, batches.head).count()
      for (n <- levels) {
        val pool = Executors.newFixedThreadPool(n)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val t0 = System.nanoTime()
        val futs = batches.map { qb =>
          scala.concurrent.Future {
            val c0 = System.nanoTime()
            val rows = Similarity.searchTopk(spark, src, kind, qb).count()
            (rows, (System.nanoTime() - c0) / 1e9)
          }
        }
        val res = futs.map(f =>
          scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
        val wall = (System.nanoTime() - t0) / 1e9
        pool.shutdown()
        val lat = res.map(_._2).sorted
        val rows = res.map(_._1).sum
        def pct(p: Double) = lat((p * (lat.size - 1)).round.toInt)
        val qps = nBatches * rawQs.length / wall
        out(s"$kind@c$n") =
          f"""{"concurrency":$n,"batches":$nBatches,"wall_sec":$wall%.2f,""" +
            f""""qps_queries":$qps%.1f,"p50_sec":${pct(0.5)}%.2f,""" +
            f""""p95_sec":${pct(0.95)}%.2f,"max_sec":${lat.last}%.2f,"rows":$rows}"""
        println(f"CONC $kind%-7s n=$n%2d  wall=$wall%7.2f s  qps=$qps%7.1f  " +
          f"p50=${pct(0.5)}%6.2f  p95=${pct(0.95)}%6.2f  max=${lat.last}%6.2f")
      }
    }
    val json = out.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    locally { java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir)); () }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/serve_concurrency.json"),
      s"""{"src":"$src","levels":[${levels.mkString(",")}],"results":{$json}}\n""")
    println(s"CONC artifact $outDir/serve_concurrency.json")
    spark.stop()
  }
}
