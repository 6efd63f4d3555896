package graft.tools

/** Time registry queries by name (two warm passes each, like Bench, but
  * without paying for the rest of the registry — the iteration loop for
  * per-query plan work). Accepts a comma-separated list so session-level
  * interactions (shared memo, GC pressure, codegen cache) between
  * adjacent queries can be reproduced outside the full bench.
  * Args: queryName[,queryName...] [sfDir] (default sf0.1). */
object QTime {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(sys.error("usage: QTime <query>[,query...] [sfDir]"))
      .split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.session(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (p <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"QTIME $name pass$p ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
