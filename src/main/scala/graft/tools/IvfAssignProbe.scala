package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.operators.Dedup

/** Measures dd7's cell-ASSIGNMENT stage under the flat round-7
  * quantizer (every vector ranks all K fine anchors: n·K·d work, K-row
  * broadcast) vs the two-level round-8 one (rank K1 = ⌈√K⌉ coarse
  * cells, refine within Dd7CoarseProbes of them: ~17·n·√K·d work,
  * √K-row broadcast) on the same probe corpus — the direct evidence
  * that the two-level split is the right asymptote. Both paths count
  * the full (vec_id, cell) assignment; candidate mining and
  * verification (identical between the two) are excluded.
  *
  * Run: SPARK_GRAFT_PROBE_OUT=/tmp/scale100 sbt "runMain
  * graft.tools.IvfAssignProbe" (reads embeddings.parquet from the
  * probe dir; env fallback to sf0.1).
  */
object IvfAssignProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val e = graft.operators.Similarity.normed(spark, dir)
    val n = e.count()
    val k = Dedup.dd7AnchorCount(n)
    val k1 = Dedup.dd7CoarseCount(k)
    println(s"PROBE corpus n=$n K=$k K1=$k1 W=${Dedup.Dd7CoarseProbes}")

    // flat (round-7 form): n·K·d cosines against a K-row broadcast
    val fine = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("aid"), col("v").as("av"), col("nrm").as("an"))
    def flat(): DataFrame =
      e.crossJoin(broadcast(fine))
        .withColumn("acos", VectorExprs.dot(col("v"), col("av")) / (col("nrm") * col("an")))
        .groupBy(col("vec_id"))
        .agg(graft.functions.SketchAggs.topk(col("acos"), col("aid"), Dedup.Dd7Probes).as("top"))
        .select(col("vec_id"), explode(col("top.id")).as("cell"))

    // two-level (current form): exactly what dd7 plans internally —
    // counting ivfPairs' `assigned` would re-verify, so rebuild the
    // assignment stage through the public pieces it is made of
    val coarse = e.filter(col("vec_id") < k1)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    def twoLevel(): DataFrame = {
      val a2c = fine.crossJoin(broadcast(coarse))
        .withColumn("ccos", VectorExprs.dot(col("av"), col("cv")) / (col("an") * col("cn")))
        .groupBy(col("aid"))
        .agg(graft.functions.SketchAggs.topk(col("ccos"), col("cid"), 1).as("t"))
        .select(col("aid"), col("t.id").getItem(0).as("cid"))
      val vc = e.crossJoin(broadcast(coarse))
        .withColumn("ccos", VectorExprs.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .groupBy(col("vec_id"))
        .agg(graft.functions.SketchAggs.topk(col("ccos"), col("cid"), Dedup.Dd7CoarseProbes).as("ct"),
          first(col("v")).as("v"), first(col("nrm")).as("nrm"))
        .select(col("vec_id"), col("v"), col("nrm"), explode(col("ct.id")).as("cid"))
      vc.join(fine.join(a2c, Seq("aid")), Seq("cid"))
        .withColumn("acos", VectorExprs.dot(col("v"), col("av")) / (col("nrm") * col("an")))
        .groupBy(col("vec_id"))
        .agg(graft.functions.SketchAggs.topk(col("acos"), col("aid"), Dedup.Dd7Probes).as("top"))
        .select(col("vec_id"), explode(col("top.id")).as("cell"))
    }

    // warm the shared input once so neither path pays the corpus scan;
    // two-level first — the flat form's n·K-row aggregation input has
    // filled the probe disk at 2M vectors (62.5B rows), and its death
    // must not mask the working path's number
    time("corpus_warm")(e.count())
    val nTwo = time("assign_two_level")(twoLevel().count())
    val nFlat = try time("assign_flat")(flat().count()) catch {
      case e: Throwable =>
        println(s"PROBE assign_flat FAILED: ${String.valueOf(e.getMessage).take(160)}")
        -1L
    }
    println(s"PROBE assignments flat=$nFlat two_level=$nTwo")
    spark.stop()
  }
}
