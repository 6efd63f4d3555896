package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpecBase {
  import spark.implicits._

  // 90% of fact rows on one hot key — the shape that wedges one reducer
  private lazy val fact = (1 to 20000).map { i =>
    val k = if (i % 10 == 0) (i % 7).toLong + 1 else 0L
    (k, i.toLong)
  }.toDF("k", "payload")

  private lazy val dim = (0L to 7L).map(k => (k, s"name$k")).toDF("k", "name")

  test("saltedJoin output equals the plain join (inner)") {
    val plain = fact.join(dim, Seq("k")).collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(fact, dim, "k", salts = 8).collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("saltedJoin output equals the plain join (left_outer, unmatched preserved)") {
    val dimMissingHot = dim.filter(col("k") =!= 0L) // hot key unmatched
    val plain = fact.join(dimMissingHot, Seq("k"), "left_outer")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(fact, dimMissingHot, "k", salts = 8, "left_outer")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salting actually spreads the hot key across sub-keys") {
    val factCols = fact.columns.map(col).toIndexedSeq
    val saltsUsed = fact.filter(col("k") === 0L)
      .withColumn("__salt", pmod(xxhash64(struct(factCols: _*)), lit(8)))
      .select("__salt").distinct().count()
    assert(saltsUsed > 4, s"hot key used only $saltsUsed of 8 salts")
  }

  test("salt assignment is deterministic across runs") {
    def salts() = fact
      .withColumn("__salt", pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .orderBy("payload").select("__salt").collect().map(_.getLong(0)).toSeq
    assert(salts() == salts())
  }

  test("q57: registered salted join matches the plain unsalted join") {
    val ev = Tables.events(spark, sfDir)
    val factQ = ev.select(
      when(col("event_id") % 5 === 0, col("user_id") % SkewOps.DimKeys)
        .otherwise(lit(SkewOps.HotKey)).as("skew_key"), col("value"))
    val dimQ = ev.select((col("user_id") % SkewOps.DimKeys).as("skew_key")).distinct()
      .withColumn("segment", concat(lit("seg_"), col("skew_key")))
    val plain = factQ.join(dimQ, Seq("skew_key"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("total"))
      .collect().map(_.toSeq).toSet
    val salted = SparkEntry.queries("q57_salted_skew_join")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("q57: no post-salt slice of the hot key exceeds 2x the mean slice") {
    val ev = Tables.events(spark, sfDir)
    val factQ = ev.select(
      when(col("event_id") % 5 === 0, col("user_id") % SkewOps.DimKeys)
        .otherwise(lit(SkewOps.HotKey)).as("skew_key"), col("value"))
    // replicate saltedJoin's exact salt derivation on the hot key's rows
    val slices = factQ.filter(col("skew_key") === SkewOps.HotKey)
      .withColumn("__salt",
        pmod(xxhash64(struct(col("skew_key"), col("value"))), lit(SkewOps.Salts)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    val mean = slices.sum.toDouble / SkewOps.Salts
    assert(slices.length == SkewOps.Salts, s"hot key reached only ${slices.length} salts")
    assert(slices.max <= 2 * mean,
      s"hot-key slice imbalance: max=${slices.max} mean=$mean")
  }

  test("q57: the salted join plans as a shuffle join, not a dim broadcast") {
    val plan = SparkEntry.queries("q57_salted_skew_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle join in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"dim side broadcast despite hint:\n$plan")
  }
}
