package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time index builder: land all three ANN index kinds (+ the
  * QuantizerStore sidecar) for each corpus dir given, via a single
  * 1-query searchTopk per kind — the same adopt-or-build path every
  * serve call uses. Landings are dir-hash-keyed in spark-warehouse and
  * the sidecar makes a later session's cold serve ≈ warm
  * (PROBE_r13_*_sims_cold), so running this ahead of a measurement
  * session moves the one-time build cost off the measured path.
  * Run: sbt "runMain graft.tools.PreLand <corpusDir> [corpusDir...]".
  */
object PreLand {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PreLand <corpusDir> [corpusDir...]")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (src <- args.toSeq) {
      val v = spark.read.parquet(s"$src/embeddings.parquet")
        .limit(1).select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray
      val kinds = sys.env.getOrElse("SPARK_GRAFT_PRELAND_KINDS", "prefix,kmeans,ivfpq")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      for (kind <- kinds) {
        val t0 = System.nanoTime()
        // the ONE caller that intends an inline build: PreLand IS the
        // build step the fail-fast serving contract points at
        graft.operators.Similarity.searchTopk(
          spark, src, kind, Seq((-1L, v)), buildIfMissing = true).count()
        println(f"PRELAND $src $kind ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
