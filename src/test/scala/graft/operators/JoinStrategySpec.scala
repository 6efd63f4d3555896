package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Pins the round-17 join-strategy fixes (OPTIMIZATION_r17.md changes
  * #2 and #3) the way MatCutPlanAuditSpec pins the matCut consumers:
  * the planner can never discover these strategies itself — the CC
  * label table is a stats-less localCheckpoint output and the td2
  * shared-gram side is not provably broadcast-safe — so each is an
  * explicit per-site choice that one innocent refactor would silently
  * turn back into a corpus-scale SortMergeJoin. The guard asserts on
  * the EXECUTED plans, auto-broadcast disabled where the fix is an
  * explicit broadcast gate (the regime a 100 TB corpus is in: a
  * stats-less frame never qualifies for auto-broadcast anyway). */
class JoinStrategySpec extends SparkSpecBase {

  /** Every physical node, descending through AQE wrappers. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Nil
    }
    p +: (p.children ++ inner).flatMap(nodes)
  }
  private def sortMergeJoins(df: DataFrame): Seq[SparkPlan] =
    nodes(df.queryExecution.executedPlan).collect { case j: SortMergeJoinExec => j }
  private def broadcastJoins(df: DataFrame): Seq[SparkPlan] =
    nodes(df.queryExecution.executedPlan).collect { case j: BroadcastHashJoinExec => j }

  private def withNoAutoBroadcast[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  test("CC closing join broadcasts the label side under the gate " +
      "(no SortMergeJoin even with auto-broadcast off) and labels stay correct") {
    import spark.implicits._
    withNoAutoBroadcast {
      // a 5-chain (exercises pointer doubling), one pair, two singletons
      val dup = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)).toDF("x", "y")
      val ids = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 20L, 21L).toDF("id")
      val out = Dedup.connectedComponents(ids, dup)
      out.count() // settle AQE on the final physical plan
      assert(sortMergeJoins(out).isEmpty,
        "the closing population join fell back to SortMergeJoin — the label side " +
          "is stats-less, so only the explicit size gate can broadcast it")
      assert(broadcastJoins(out).nonEmpty,
        "expected the gated broadcast of the label table in the closing join")
      val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Seq(1L, 2L, 3L, 4L, 5L).forall(m(_) == 1L), s"chain labels wrong: $m")
      assert(m(10L) == 10L && m(11L) == 10L, s"pair labels wrong: $m")
      assert(m(20L) == 20L && m(21L) == 21L, s"singletons must self-label: $m")
    }
  }

  test("the guard is not vacuous: the same stats-less frame joined WITHOUT " +
      "the gate sort-merges") {
    import spark.implicits._
    withNoAutoBroadcast {
      val ids = Seq(1L, 2L, 3L).toDF("id")
      // what connectedComponents' labels frame looks like to the planner:
      // a localCheckpoint output with no size stats
      val statsless = Seq((1L, 1L)).toDF("id", "label").localCheckpoint(true)
      val ungated = ids.join(statsless, Seq("id"), "left_outer")
      ungated.count()
      assert(sortMergeJoins(ungated).nonEmpty,
        "expected the ungated join of a stats-less frame to plan a SortMergeJoin")
    }
  }

  test("dd6/dd9/td1 executed plans carry no SortMergeJoin (the closing-join " +
      "fix reaches every graded CC consumer)") {
    for (name <- Seq("dd6_dedup_clusters", "dd9_semantic_dedup", "td1_curation_pipeline")) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count()
      assert(sortMergeJoins(df).isEmpty, s"$name plans a SortMergeJoin")
    }
  }

  test("td2's shared-gram join never sort-merges (shuffle_hash hint in effect)") {
    val df = graft.SparkEntry.queries("td2_decontamination")(spark, sfDir)
    df.count()
    assert(sortMergeJoins(df).isEmpty,
      "td2 plans a SortMergeJoin — the shared-gram shuffle_hash hint is gone")
  }
}
