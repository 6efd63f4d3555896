package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 50× document-corpus probe that, unlike ScaleProbe's 10× (which gives
  * every doc 9 near-dup copies → 1000× the true-pair count), keeps the
  * near-dup density CONSTANT: each replica appends doc-length unique
  * filler words, dropping cross-replica Jaccard to ~0.33 — below the 0.5
  * threshold, so true pairs stay per-replica (~50× round-1's count, not
  * 1000×) while the corpus grows 50×. Cross-replica pairs still surface
  * as LSH candidates at J≈0.33 (band-collision p ≈ 30%), which is the
  * realistic stress: a large borderline-similar candidate set that
  * verification must reject. Separates "does blocking scale with corpus
  * size" from "does verification scale with dup density".
  * Run: sbt "runMain graft.tools.DocScaleProbe"
  */
object DocScaleProbe {
  val N = 50
  val Out = "/tmp/docscale50"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val src = "/root/testdata/sf0.1"

    if (!new java.io.File(s"$Out/_done").exists()) {
      val t0 = System.nanoTime()
      val docs = graft.Tables.documents(spark, src)
        .select(col("doc_id"), col("text")).as[(Long, String)]
      (0 until N).map { i =>
        if (i == 0) docs.map { case (id, t) => (id, t) }
        else docs.map { case (id, t) =>
          // doc-length unique filler → cross-replica Jaccard ≈ g/(3g) ≈ 0.33
          val n = t.split(' ').length
          val filler = Array.tabulate(n)(w => s"u${i}x${id}w$w").mkString(" ")
          (id + i * 10000000L, t + " " + filler)
        }
      }.reduce(_ union _)
        .toDF("doc_id", "text")
        .repartition(64)
        .write.mode("overwrite").parquet(s"$Out/documents.parquet")
      for (t <- Seq("embeddings"))
        graft.Tables.load(spark, src, t).write.mode("overwrite").parquet(s"$Out/$t.parquet")
      new java.io.File(Out, "_done").createNewFile()
      println(f"PROBE50 datagen ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    for (name <- Seq("dd1_dedup_exact", "dd3_dedup_minhash_lsh", "dd5_dedup_simhash",
      "dd6_dedup_clusters", "td1_curation_pipeline", "td2_decontamination",
      "tx1_token_stats", "tx4_fingerprint", "q35_deterministic_split")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, Out).count()
      println(f"PROBE50 $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    spark.stop()
  }
}
