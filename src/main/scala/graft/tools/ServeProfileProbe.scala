package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch ivfpq serving-floor profile (VERDICT r15 #4): times each
  * phase of one serve batch — driver probe ranking, ADC tables, index
  * re-resolution, the shortlist job, the exact re-rank job, and the
  * unmodified end-to-end serve — at a sweep of nprobe depths: `first`
  * (the section's first batch) then warm (min of 2). Only the FIRST
  * swept nprobe's `first` is JVM-cold — later sections run with the
  * index resolved, memos built and codegen cached, so their `first`
  * measures per-depth first-batch cost, not cold start (ADVICE r16:
  * the field was previously labeled "cold", which misread across
  * depths; run one nprobe per JVM for true cold numbers).
  *
  * Usage: ServeProfileProbe <corpusDir> (index must be PRE-LANDED —
  * PreLand/buildIndex; serving fails fast otherwise). Env:
  * SPARK_GRAFT_SERVE_NPROBES (default "0,32,8" — 0 = kind default ≈
  * √K), SPARK_GRAFT_SERVE_RPP (default DefaultRerankPerProbe),
  * SPARK_GRAFT_PROBE_OUT (artifact dir, default /tmp),
  * SPARK_GRAFT_RATE_TAG (tag, default r16). */
object ServeProfileProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/scale1000d1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/tmp")
    val tag = sys.env.getOrElse("SPARK_GRAFT_RATE_TAG", "r16")
    val nprobes = sys.env.getOrElse("SPARK_GRAFT_SERVE_NPROBES", "0,32,8")
      .split(",").map(_.trim.toInt).toSeq
    val rpp = sys.env.get("SPARK_GRAFT_SERVE_RPP").map(_.toInt)
      .getOrElse(graft.operators.Similarity.DefaultRerankPerProbe)

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the RateServeProbe query-pool shape: 10 corpus vectors, negated
    // ids so the self-pair filter stays inert
    val qs: Seq[(Long, Array[Double])] =
      spark.read.parquet(s"$src/embeddings.parquet")
        .filter(col("vec_id") % 997 === 3).limit(10)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().toSeq
        .map(r => (-(r.getLong(0) + 1), r.getSeq[Double](1).toArray))

    def fmt(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString("{", ",", "}")

    val sections = nprobes.map { np =>
      val first = graft.operators.Similarity.profileServeIvfpq(spark, src, qs, np, rpp)
      val w1 = graft.operators.Similarity.profileServeIvfpq(spark, src, qs, np, rpp)
      val w2 = graft.operators.Similarity.profileServeIvfpq(spark, src, qs, np, rpp)
      val warm = w1.zip(w2).map { case ((k, a), (_, b)) => (k, math.min(a, b)) }
      println(s"PROFILE np=$np first=${fmt(first)}")
      println(s"PROFILE np=$np warm=${fmt(warm)}")
      s""""np$np":{"first":${fmt(first)},"warm":${fmt(warm)}}"""
    }
    val json =
      s"""{"src":"$src","rpp":$rpp,"queries":${qs.size},""" +
        s""""profiles":{${sections.mkString(",")}}}"""
    val out = s"$outDir/SERVEPROF_${tag}.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(s"SERVEPROF wrote $out")
    spark.stop()
  }
}
