package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is registered here as a
  * named query; those with ANSI-SQL-expressible semantics also carry a
  * DuckDB oracle (the driver's correctness gate). Implementations live
  * in graft.operators.* / graft.functions.*; streaming twins of the
  * stateful queries live in graft.streaming and are asserted
  * stream==batch by the test suite.
  */
object SparkEntry {

  /** The full registry, SURVEY §2.10 (Q1–Q57 + q05/q08/q09/q13 variants)
    * plus the training-data pipeline surface (dedup dd1–dd10, similarity
    * sim1–sim4 + the served-index sim2b, text tx1–tx7, multimodal
    * mm1–mm3, pipelines td1–td3) — 90 queries, each with a DuckDB
    * oracle. */
  val registry: Seq[QueryDef] =
    Relational.all ++ WindowedAgg.all ++ StatefulOps.all ++ StatelessOps.all ++
      Dedup.all ++ Simhash.all ++ Similarity.all ++ TextOps.all ++ Multimodal.all ++
      Pipeline.all ++ SkewOps.all ++ AsyncOps.all ++
      graft.streaming.StreamTwins.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
