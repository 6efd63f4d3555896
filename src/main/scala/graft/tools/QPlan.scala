package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan dump for the ANN landing pipeline (not part of the library
  * surface): prints the physical plan of `Dedup.rankedPrefix` — the
  * quantization job every index landing runs — without executing it,
  * so join strategies and aggregate modes (ObjectHashAggregate
  * sort-fallback is the r15 landing-transient suspect) can be read
  * directly. runMain graft.tools.QPlan <corpusDir>.
  */
object QPlan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ranked = graft.operators.Dedup.rankedPrefix(spark, d)
    println("==== rankedPrefix physical plan ====")
    println(ranked.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
