package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the co-located (bucketed) answer to the big⋈big join that
  * is the scale probe's one superlinear point: at 1000× the
  * lineitem⋈orders shuffle join (q04's core) outgrows single-node
  * shuffle partitions and spills. At 100 TB the fix is not a bigger
  * shuffle — it's not shuffling: both fact tables bucketed on orderkey
  * read co-located, and the join plans with ZERO Exchange
  * (`Lakehouse.writeBucketed`, asserted exchange-free in LakehouseSpec
  * at fixture scale). This probe prints the measured gap at N× so the
  * claim carries numbers, and verifies the bucketed plan really has no
  * Exchange before timing it.
  *
  * The one-time bucketed write is the amortized cost: it is how a
  * lakehouse would land the table ONCE, paying the shuffle a single
  * time instead of on every downstream join.
  *
  * Run after ScaleProbe has materialized /tmp/scaleN:
  *   sbt "runMain graft.tools.BucketJoinProbe 100" (default N=100).
  */
object BucketJoinProbe {
  def main(args: Array[String]): Unit = {
    val N = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(100)
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", s"/tmp/scale$N")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$dir/warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val li = graft.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")

    def revenue(lhs: org.apache.spark.sql.DataFrame, rhs: org.apache.spark.sql.DataFrame) =
      lhs.join(rhs, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

    val shuffled = time("join_shuffle")(revenue(li, o).count())

    // one-time landing cost: bucket both facts on the join key
    // (writeBucketed clears any half-written table/location from a
    // previous run — the metastore is per-JVM but the warehouse persists)
    val buckets = 64
    time("bucket_write") {
      graft.sources.Lakehouse.writeBucketed(li, "bp_lineitem", Seq("l_orderkey"), buckets)
      graft.sources.Lakehouse.writeBucketed(o, "bp_orders", Seq("o_orderkey"), buckets)
    }

    val bli = spark.table("bp_lineitem")
    val bo = spark.table("bp_orders")
    val plan = revenue(bli, bo).queryExecution.executedPlan.toString
    // the groupBy on o_custkey still exchanges (different key — correct);
    // what must be gone is the Exchange UNDER the join. If AQE picked a
    // different join (no SortMergeJoin line), dropWhile would consume the
    // whole plan and the check would be vacuously true — require the match.
    val underJoin = plan.linesIterator.dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
    require(underJoin.nonEmpty, s"no SortMergeJoin in bucketed plan — cannot assert exchange-freedom:\n$plan")
    println(s"PROBE bucketed_join_exchange_free=${!underJoin.contains("Exchange")}")
    println(underJoin.linesIterator.take(14).mkString("PLAN\n", "\n", ""))
    val bucketed = time("join_bucketed")(revenue(bli, bo).count())
    println(s"PROBE rows shuffle=$shuffled bucketed=$bucketed equal=${shuffled == bucketed}")
    spark.stop()
  }
}
