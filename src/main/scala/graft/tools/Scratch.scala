package graft.tools

/** Throwaway single-query runner for iteration (not part of the
  * library surface): runMain graft.tools.Scratch <query> <sfDir>. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.Graft.session(master = "local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, d)
    df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/scratch_$name")
    val back = spark.read.parquet(s"/tmp/scratch_$name")
    println(s"SCRATCH rows=${back.count()}")
    back.orderBy(back.columns.map(org.apache.spark.sql.functions.col): _*)
      .show(60, truncate = false)
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/scratch_$name.sql"), sql.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
