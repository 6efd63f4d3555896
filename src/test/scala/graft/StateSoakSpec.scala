package graft

import graft.streaming.{DedupStream, FkJoin, StateTtl}
import graft.streaming.FkJoin.{LeftRow, RightRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Multi-horizon state-boundedness soak (VERDICT r10 #5): drive the two
  * read-side-TTL engines — the FK join and the LSH ingest — for many
  * micro-batches past several TTL horizons on the manual clock, and
  * read `Metrics.stateStoreGauges` to prove `numRowsTotal` PLATEAUS
  * where keys recur, instead of trusting the StateTtl scaladoc's claim.
  *
  * What read-side TTL can and cannot bound, pinned here:
  *  - state whose keys RECUR (the joiner's per-fk rows — a fixed
  *    merchant universe; the LSH buckets of recurring boilerplate
  *    content) plateaus: every re-touch clears that key's expired rows;
  *  - state whose keys never return (the router's per-pk bookkeeping
  *    under an ever-fresh pk stream) keeps its expired rows on disk —
  *    the documented StateTtl caveat, asserted as REAL growth below so
  *    the limit stays visible, not hidden by a friendly workload.
  *
  * Each engine runs the identical workload twice — with and without
  * TTL — and the no-TTL control must grow monotonically, so a plateau
  * can only come from expiry, not from the workload shape.
  */
class StateSoakSpec extends SparkSpecBase
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // The soak's whole point is reading the numRowsTotal plateau curve,
  // which the engine's write-path default (trackTotalNumberOfRows=false,
  // r17) turns off — every stream this suite starts opts back in, and
  // afterAll restores the default (Graft.session's drift check would
  // otherwise reject the session for the next suite in this JVM).
  private val TrackKey =
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
  override protected def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(TrackKey, "true")
  }
  override protected def afterAll(): Unit = {
    spark.conf.set(TrackKey, "false")
    super.afterAll()
  }

  private val Batches = 12
  private val StepMs = 1000L
  private val TtlMs = 2500L // ~2.5 batches — several horizons in 12

  /** numRowsTotal per (batchId ascending, stateful operator), summed
    * over operators when `perOp` = false. Operators are positionally
    * stable within a progress update but share an operatorName, so
    * per-op curves are keyed by index within the progress entry. */
  private def gaugeCurve(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Seq[Long]] =
    q.recentProgress.toSeq.filter(_.stateOperators.nonEmpty)
      .sortBy(_.batchId)
      .map(_.stateOperators.toSeq.map(_.numRowsTotal))

  private def fkSoak(ttl: Option[StateTtl], name: String): Seq[Seq[Long]] = {
    implicit val sq = spark.sqlContext
    ManualTtlClock.nowMs.set(1000L)
    val lms = MemoryStream[LeftRow]
    val rms = MemoryStream[RightRow]
    val q = FkJoin.fkJoinStream(lms.toDS(), rms.toDS(), ttl = ttl)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    var seq = 0L
    try {
      for (b <- 0 until Batches) {
        ManualTtlClock.nowMs.addAndGet(StepMs)
        // 20 FRESH pks per batch (entity churn) subscribing to a FIXED
        // 4-fk universe; one right update per fk per batch keeps every
        // fk key re-touched — the joiner's expiry precondition.
        val lefts = (0 until 20).map { i =>
          seq += 1; LeftRow(b * 1000L + i, (i % 4).toLong, s"v$b-$i", seq)
        }
        lms.addData(lefts)
        val rights = (0 until 4).map { f => seq += 1; RightRow(f.toLong, s"r$b-$f", seq) }
        rms.addData(rights)
        q.processAllAvailable()
      }
      gaugeCurve(q)
    } finally q.stop()
  }

  test("FK-join soak: joiner state plateaus under TTL; no-TTL control grows monotone") {
    val ttlCurve = fkSoak(Some(StateTtl(TtlMs, ManualTtlClock.clock)), "fksoak_ttl")
    val rawCurve = fkSoak(None, "fksoak_raw")
    info(s"fk soak TTL curve (per-op rows/batch): ${ttlCurve.map(_.mkString("+")).mkString(", ")}")
    info(s"fk soak raw curve (per-op rows/batch): ${rawCurve.map(_.mkString("+")).mkString(", ")}")

    // no-TTL control: summed state must keep growing through the run
    val rawSum = rawCurve.map(_.sum)
    assert(rawSum.last >= 2.0 * rawSum(rawSum.size / 3),
      s"control must grow ~linearly, got $rawSum")

    // TTL run: the JOINER (the op whose final row count is smaller —
    // the router's never-re-touched pk rows dominate by the end) must
    // plateau: flat over the last third, and bounded by the TTL window
    // (≈3 live batches × 20 subs + 4 rights), not by batches ran.
    val joiner = ttlCurve.map(_.min)
    val router = ttlCurve.map(_.max)
    assert(joiner.last <= 1.3 * joiner(2 * joiner.size / 3).max(1L),
      s"joiner state must be flat across the last TTL horizons, got $joiner")
    assert(joiner.last <= 110, s"joiner state must track the TTL window, got $joiner")
    // the router caveat stays real: fresh-pk rows expire but are never
    // re-read, so read-side TTL cannot shrink them
    assert(router.last >= 1.7 * router(router.size / 2),
      s"router per-pk state is expected to grow under fresh keys, got $router")
  }

  private def lshSoak(ttl: Option[StateTtl], name: String): Seq[Seq[Long]] = {
    implicit val sq = spark.sqlContext
    ManualTtlClock.nowMs.set(1000L)
    val dms = MemoryStream[(Long, String)]
    // 4 recurring boilerplate templates: identical text → identical
    // signature → the SAME (band, bv) buckets every batch — each bucket
    // is re-touched per batch, so read-side expiry keeps firing.
    val templates = (0 until 4).map(k =>
      s"alpha$k bravo charlie delta echo foxtrot golf hotel india juliet kilo lima")
    val q = DedupStream.candidates(dms.toDS().toDF("doc_id", "text"), ttl = ttl)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      for (b <- 0 until Batches) {
        ManualTtlClock.nowMs.addAndGet(StepMs)
        // 8 fresh doc_ids per batch, 2 per template (the boilerplate-
        // recurrence shape: new docs, recurring content)
        dms.addData((0 until 8).map(i => (b * 100L + i, templates(i % 4))))
        q.processAllAvailable()
      }
      gaugeCurve(q)
    } finally q.stop()
  }

  test("LSH-ingest soak: bucket membership plateaus under TTL; no-TTL control grows") {
    val ttlCurve = lshSoak(Some(StateTtl(TtlMs, ManualTtlClock.clock)), "lshsoak_ttl")
    val rawCurve = lshSoak(None, "lshsoak_raw")
    info(s"lsh soak TTL curve (rows/batch): ${ttlCurve.map(_.sum).mkString(", ")}")
    info(s"lsh soak raw curve (rows/batch): ${rawCurve.map(_.sum).mkString(", ")}")

    val raw = rawCurve.map(_.sum)
    assert(raw.last >= 2.0 * raw(raw.size / 3), s"control must grow, got $raw")

    val ttlRows = ttlCurve.map(_.sum)
    assert(ttlRows.last <= 1.3 * ttlRows(2 * ttlRows.size / 3),
      s"bucket state must be flat across the last TTL horizons, got $ttlRows")
    // bound ∝ TTL window: ≈3 live batches × 8 docs × 32 band buckets
    // (+ per-bucket meta rows), NOT ∝ batches ran (raw ends ~4× higher)
    assert(ttlRows.last < raw.last / 2.0,
      s"TTL state (${ttlRows.last}) must end well below the control (${raw.last})")
  }
}
