package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hopping-window cost vs window/slide ratio and key density: times the
  * slice-assign plan (WindowedAgg.hoppingSliced — raw rows aggregated
  * once per slide slice, only slice PARTIALS fanned out ×ratio) against
  * the naive `window(ts, size, slide)` plan (every raw row fanned out
  * ×ratio before the first aggregation) at ratios 4× (1h/15m, the q08
  * shape), 12× (1h/5m) and 60× (1h/1m), over both the fixture's SPARSE
  * key space and a DENSE one (key = user_id % 64).
  *
  * Measured (10× dataset, local[32]): naive wins at 4× (0.6 s vs 1.0 s
  * sparse — its fan-out collapses in the codegen'd map-side partial agg
  * and slicing's second shuffle is pure overhead), the plans tie at
  * ~12×, and sliced wins at 60× (8.5 s vs 11.5 s sparse, 1.6 s vs
  * 3.0 s dense) because the naive plan hash-inserts every raw row
  * ratio× while sliced inserts it once. Hence q08 (4×) ships the
  * native plan and hoppingSliced is the ≳12× scale path.
  *
  * Run over the ScaleProbe dataset when present (/tmp/scale10) so the
  * difference is visible above job overhead, else sf0.1.
  * Run: sbt "runMain graft.tools.HopRatioProbe"
  */
object HopRatioProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.get("SPARK_GRAFT_PROBE_OUT")
      .orElse(Option.when(new java.io.File("/tmp/scale10/_done").exists())("/tmp/scale10"))
      .getOrElse("/root/testdata/sf0.1")
    val raw = graft.Tables.events(spark, dir)

    def naive(ev: org.apache.spark.sql.DataFrame, sizeSec: Long, slideSec: Long) =
      ev.groupBy(window(col("ts"), s"$sizeSec seconds", s"$slideSec seconds"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").cast("long").as("window_start"),
          col("user_id"), col("n"), col("sum_value"))

    def time(label: String, f: => Long): Unit = {
      f // warm pass: parquet footers, codegen
      val t0 = System.nanoTime()
      val n = f
      println(f"HOPPROBE $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    // At the 1000× corpus the exceptAll equivalence check shuffles two
    // multi-billion-row result sets and fills a single-node disk; the
    // equivalence is scale-independent (proven at 10×), so big-corpus
    // runs set SPARK_GRAFT_HOP_CHECK=false and restrict the config grid
    // (sparse ratio-60 output alone is ~6B rows at 1000×) via
    // SPARK_GRAFT_HOP_RATIOS / SPARK_GRAFT_HOP_DENSITIES.
    val check = sys.env.getOrElse("SPARK_GRAFT_HOP_CHECK", "true").toBoolean
    val ratios = sys.env.getOrElse("SPARK_GRAFT_HOP_RATIOS", "4,12,60")
      .split(',').map(_.trim.toLong).toSeq
    val densities = sys.env.getOrElse("SPARK_GRAFT_HOP_DENSITIES", "sparse,dense")
      .split(',').map(_.trim).toSet
    for ((density, ev) <- Seq(
        ("sparse", raw),
        ("dense ", raw.withColumn("user_id", col("user_id") % 64)))
        if densities.contains(density.trim)) {
      for (ratio <- ratios) {
        val (size, slide) = (3600L, 3600L / ratio)
        if (check) {
          // equivalence — the probe is meaningless if the plans differ
          val diff = graft.operators.WindowedAgg.hoppingSliced(ev, size, slide)
            .exceptAll(naive(ev, size, slide)).count()
          require(diff == 0, s"sliced != naive at ratio $ratio ($density)")
        }
        time(s"$density naive  ratio=$ratio", naive(ev, size, slide).count())
        time(s"$density sliced ratio=$ratio",
          graft.operators.WindowedAgg.hoppingSliced(ev, size, slide).count())
      }
    }
    spark.stop()
  }
}
