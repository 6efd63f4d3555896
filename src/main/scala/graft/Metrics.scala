package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine observability — the ResponsiveMetrics analog
  * (/root/reference/kafka-client/src/main/java/dev/responsive/kafka/internal/metrics/ResponsiveMetrics.java)
  * re-expressed on Spark's own listener bus: every completed query
  * action is recorded with its wall-clock duration and the executed
  * plan's row/shuffle counters. Spark already aggregates per-operator
  * SQLMetrics; this surface collects them per query so a library user
  * gets programmatic access (the reference exports to a metrics
  * registry; a cluster deployment would forward these to its sink).
  */
final case class QueryMetric(
    action: String,
    durationNs: Long,
    outputRows: Long,
    shuffleBytesWritten: Long,
    failed: Boolean,
    /** Rows observed entering the query at its origin tap (-1 when the
      * query has no [[Metrics.observeOrigin]] tap) — the reference's
      * counted-once-at-origin telemetry
      * (kafka-client/src/main/java/dev/responsive/kafka/internal/clients/OriginEventTracker.java):
      * rows-IN accounting that survives every downstream filter/join,
      * where outputRows only says what came OUT. */
    originRows: Long = -1L)

/** One stateful operator's state-store gauges for one micro-batch — the
  * analog of the reference's per-store metrics registry
  * (kafka-client/src/main/java/dev/responsive/kafka/internal/metrics/ —
  * per-store size/flush/latency gauges, MetricsUtils scoping), surfaced
  * from Spark's own StreamingQueryProgress.stateOperators rather than a
  * custom registry: Spark already aggregates per-operator state metrics
  * at every batch; this gives a library user the "which store is hot"
  * answer programmatically. */
final case class StateStoreGauge(
    queryName: String,
    batchId: Long,
    operatorName: String,
    /** Rows resident in the operator's state store after the batch. */
    numRowsTotal: Long,
    /** Rows written this batch (puts). */
    numRowsUpdated: Long,
    /** Rows evicted this batch (watermark/TTL removals). */
    numRowsRemoved: Long,
    /** Time spent committing state this batch, ms — the reference's
      * flush-latency sensor analog. */
    commitTimeMs: Long,
    /** Resident state memory (provider-reported), bytes. */
    memoryUsedBytes: Long,
    /** State-store partitions backing the operator. */
    numShufflePartitions: Long)

final class MetricsListener extends QueryExecutionListener {
  private val queue = new ConcurrentLinkedQueue[QueryMetric]()

  /** Walk the FINAL physical plan: AQE wraps the tree in
    * AdaptiveSparkPlanExec and materialized stages in QueryStageExec —
    * the interesting metrics live inside both. */
  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
      case s: QueryStageExec => walk(s.plan)(f)
      case other => other.children.foreach(walk(_)(f))
    }
  }

  private def metricSum(qe: QueryExecution, name: String): Long = {
    var total = 0L
    walk(qe.executedPlan)(node =>
      node.metrics.get(name).foreach(m => total += math.max(0L, m.value)))
    total
  }

  private def rootRows(qe: QueryExecution): Long = {
    var rows = -1L
    walk(qe.executedPlan) { node =>
      if (rows < 0) node.metrics.get("numOutputRows").foreach(m => rows = m.value)
    }
    rows
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    queue.add(QueryMetric(
      funcName,
      durationNs,
      // first operator (closest to the root) that reports produced rows
      rootRows(qe),
      metricSum(qe, "shuffleBytesWritten"),
      failed = false,
      originRows = {
        // one explicit observeOrigin tap, or any number of per-source
        // taps from Metrics.TapSourcesKey — sum whatever is present
        val taps = qe.observedMetrics.collect {
          case (k, row) if k == Metrics.OriginTap || k.startsWith(Metrics.OriginTap + "#") =>
            row.getAs[Long]("rows_in")
        }
        if (taps.isEmpty) -1L else taps.sum
      }))

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
    queue.add(QueryMetric(funcName, -1L, -1L, -1L, failed = true))

  /** Snapshot of everything recorded so far (oldest first). */
  def snapshot(): Seq[QueryMetric] = queue.iterator().asScala.toSeq

  def clear(): Unit = queue.clear()
}

object Metrics {
  /** Name of the origin observation tap. */
  val OriginTap = "origin"

  /** Session-conf flag: when "true", [[Tables.load]] wraps every fixture
    * scan in a per-source origin tap, so ANY registry query run reports
    * rows-in via [[QueryMetric.originRows]] with no per-query wiring —
    * the harness-wide form of the reference's origin-event accounting.
    * Default OFF: an observe tap is a CollectMetrics plan node and
    * predicates deliberately do NOT push through it (it counts rows at
    * the tap, pre-filter — that is the semantics), so accounting runs
    * (Verify) turn it on while the bench keeps the untapped, fully
    * pushed-down plans it is grading. */
  val TapSourcesKey = "graft.metrics.tapSources"

  /** Per-source origin tap with a unique name — a single plan may tap
    * several sources and CollectMetrics names must be unique within a
    * plan. The listener sums all of them into originRows. */
  private val tapSeq = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def tapSource(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count, lit}
    df.observe(s"$OriginTap#${tapSeq.incrementAndGet()}", count(lit(1)).as("rows_in"))
  }

  /** Tap a DataFrame at its origin so every downstream action ALSO
    * reports how many rows entered the pipeline — the analog of the
    * reference's origin-event accounting (kafka-client/src/main/java/dev/responsive/kafka/internal/clients/OriginEventReporterImpl.java:
    * each record is counted exactly once, where it first appears, no
    * matter how many operators touch it afterwards). Implemented as
    * `df.observe` — a CollectMetrics node, a zero-shuffle accumulator
    * tap in the plan, NOT a second scan.
    *
    * Batch: the count lands in QueryMetric.originRows via the attached
    * MetricsListener. Streaming: the same tap surfaces per micro-batch
    * in StreamingQueryProgress.observedMetrics("origin") — attach at
    * the readStream source before any transform. */
  def observeOrigin(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count, lit}
    df.observe(OriginTap, count(lit(1)).as("rows_in"))
  }

  /** Per-store gauges for every stateful operator of a streaming query,
    * one row per (micro-batch, operator), oldest batch first — read any
    * time; `recentProgress` retains the last
    * `spark.sql.streaming.numRecentProgressUpdates` (default 100)
    * batches. Batches with no stateful operator contribute no rows.
    * See [[StateStoreGauge]] for the reference-metrics mapping. */
  def stateStoreGauges(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[StateStoreGauge] =
    q.recentProgress.toSeq.flatMap { p =>
      p.stateOperators.toSeq.map { so =>
        StateStoreGauge(
          queryName = Option(p.name).getOrElse(""),
          batchId = p.batchId,
          operatorName = so.operatorName,
          numRowsTotal = so.numRowsTotal,
          numRowsUpdated = so.numRowsUpdated,
          numRowsRemoved = so.numRowsRemoved,
          commitTimeMs = so.commitTimeMs,
          memoryUsedBytes = so.memoryUsedBytes,
          numShufflePartitions = so.numShufflePartitions)
      }
    }

  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: MetricsListener): Unit =
    spark.listenerManager.unregister(l)
}
