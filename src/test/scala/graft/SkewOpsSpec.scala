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
}
