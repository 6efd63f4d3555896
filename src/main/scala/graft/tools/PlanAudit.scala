package graft.tools
import org.apache.spark.sql.SparkSession
/** Prints physical plans for the headline queries so scan pushdown,
  * broadcast choices, and shuffle counts can be audited (the
  * .explain("formatted") loop the build plan calls for). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val targets = if (args.nonEmpty) args.toSeq else Seq(
      "q01_filter_project", "q03_stream_table_join", "q04_join_chain",
      "q06_broadcast_join", "q07_tumbling_window", "q10_interval_join",
      "q17_topk", "q21_checksum_udaf")
    for (name <- targets) {
      println(s"\n===================== $name =====================")
      val df = graft.SparkEntry.queries(name)(spark, d)
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
