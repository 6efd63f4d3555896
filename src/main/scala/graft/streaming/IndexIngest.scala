package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the persisted ANN serving index: newly-
  * ingested vectors are quantized under the corpus's FROZEN prefix
  * quantizer and appended to the landed cell-bucketed index table per
  * micro-batch, so the served top-k surface (sim2b's probed-cells-only
  * plan) sees fresh vectors without ever re-landing the corpus. This
  * closes the ingest→serve loop the reference runs through its
  * changelog-restore machinery (state mutates in place, readers see
  * updates; e.g. the commit-then-serve flow behind interactive queries)
  * re-expressed lakehouse-first: the "state" is a bucketed table,
  * the "commit" is an atomic per-batch bucketed append.
  *
  * Frozen-quantizer semantics are the standard IVF add contract
  * (FAISS `IndexIVF.add`): cell centroids never move after the build,
  * so an appended vector's cells are exactly what a full re-land would
  * assign it — the table's (cell, vec_id, v, nrm) content stays equal
  * to a from-scratch landing of corpus ∪ appends (spec-pinned in
  * IndexIngestSpec; `seq` is maintenance metadata on top), and the
  * landing fingerprint stays valid because the quantizer inputs (the
  * ORIGINAL corpus prefix) are untouched by appends.
  *
  * DELETE / UPSERT contract (the reference's put-null⇒delete,
  * kafka-client/src/main/java/dev/responsive/kafka/internal/stores/ResponsiveKeyValueStore.java:148-155, applied to the landed index):
  * a batch row with a NULL embedding deletes its vec_id; a non-null row
  * whose vec_id already exists is an UPSERT — in both cases the batch
  * writes a tombstone (vec_id, seq) into the table's sidecar, and
  * upsert rows land with the same seq (so they survive their own
  * tombstone while every strictly-older row for that id dies). Serving
  * masks tombstoned rows at read
  * ([[graft.sources.Lakehouse.maskTombstones]]);
  * [[graft.sources.Lakehouse.compactMaintained]] drops them physically
  * and clears the sidecar. Because an upsert must supersede the old
  * rows, EVERY incoming id is tombstoned — callers with insert-only
  * streams who want a tombstone-free sidecar can pass
  * `upserts = false`.
  *
  * Scale shape:
  *  - per arriving vector: (K1 + probes·K/K1)·d ≈ √K·d multiply-adds —
  *    the same two-level assignment [[EmbedDedupStream]] runs for
  *    dedup-at-ingest (level 1 against the broadcast √K coarse array,
  *    level 2 via the distributed cid-keyed fine-cell join);
  *  - per micro-batch: ONE bucketed append — files land hashed and
  *    named by bucket id, so bucket pruning and Exchange-free joins
  *    keep working across old and new rows — plus (when the batch
  *    deletes/upserts) one small tombstone sliver;
  *  - file slivers (one per bucket per batch) are bounded by
  *    [[graft.sources.Lakehouse.compactMaintained]], the bucketed twin
  *    of the compaction every incremental sink needs.
  */
object IndexIngest {

  /** Assign one batch of raw vectors (vec_id, embedding: float array)
    * to the frozen quantizer's cells and return serving-index rows
    * (cell, vec_id, v, nrm, seq) — [[EmbedDedupStream.assignments]]'s
    * multi-assignment (bv = fine cell) joined back to the vector
    * payload, with the norm computed by the batch pipeline's exact
    * expressions so served cosines are bit-identical for old and new
    * rows. `seq` is the batch's maintenance sequence number (0 for the
    * corpus landing). */
  private[graft] def assignBatch(
      batch: DataFrame,
      ci: EmbedDedupStream.CoarseIndex,
      cells: DataFrame,
      seq: Long = 0L): DataFrame = {
    val normed = batch
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dot(col("v"), col("v"))))
    EmbedDedupStream.assignments(batch, ci, cells)
      .select(col("bv").as("cell"), col("doc_id").as("vec_id"))
      .join(normed, Seq("vec_id"))
      .select(col("cell"), col("vec_id"), col("v"), col("nrm"), lit(seq).as("seq"))
  }

  /** Start the maintenance stream: `vecs` (a streaming DataFrame of
    * (vec_id, embedding); embedding NULL ⇒ delete) → frozen-quantizer
    * assignment → bucketed append into `corpusDir`'s landed prefix
    * index (landed first if absent). Sibling index kinds that are
    * ALREADY LANDED (kmeans cells, composed IVF+PQ codes) receive the
    * same appends — frozen trained-quantizer assignment / frozen-
    * codebook encode — and the same tombstones, so every serving kind
    * stays fresh (ADVICE r12); a kind landed later catches up at
    * landing time instead. Returns the running query; each committed
    * micro-batch is immediately visible to
    * [[graft.operators.Similarity]]'s served queries (`insertInto`
    * refreshes the catalog relation).
    *
    * Idempotence (ADVICE r11): with `checkpointDir` set, each applied
    * micro-batch records its batchId in the table's `_graft_commits`
    * log UNDER THIS STREAM'S IDENTITY (the checkpoint path hash —
    * ADVICE r12), and a replayed batch (the SAME checkpoint re-runs
    * the last uncommitted one) is SKIPPED instead of double-appended;
    * a stream restarted under a different checkpoint restarts its
    * batchId counter and is never skipped against the old one. The append and the
    * commit record are two writes, not one transaction — a crash
    * landing exactly between them re-appends one batch on restart;
    * served top-k is immune (topkDistinct dedups ids) and
    * [[graft.sources.Lakehouse.compactMaintained]] drops the
    * byte-identical duplicate rows. Without a checkpoint the source
    * itself replays arbitrarily on restart, so no batch-skip is
    * attempted (test-only mode; production callers should set one).
    *
    * `compactEvery = Some(n)`: every n-th committed batch runs
    * [[graft.sources.Lakehouse.compactMaintained]] on every maintained
    * table — the operational answer to per-batch sliver files and
    * update-heavy tombstone growth (the sidecar broadcast is bounded by
    * changes-since-last-compaction; an unbounded cadence on an
    * update-heavy stream would grow it without limit). Safe HERE and
    * only here: compaction's mutual-exclusion contract (no concurrent
    * appends) holds inside the stream's own foreachBatch. Same-JVM
    * concurrent READERS resolve through the table's monitor
    * (Lakehouse.lockFor — the MAINT_r13 concurrent-serve probe caught
    * a reader adopting the half-swapped stage out from under the
    * writer), so they block for the metadata half of the swap and then
    * see the compacted table; a reader's already-PLANNED scan can
    * still lose files to the swap's delete and should retry once
    * ([[ServeStream]] does). Runs AFTER the batch's commit record — a
    * crash between them costs only a deferred compaction, never a lost
    * batch. */
  /** `compactSliverRatio`: volume trigger layered on the cadence — at
    * a cadence tick each maintained table compacts only if the bytes
    * appended since its last landing/compaction have reached `ratio` ×
    * its generation byte mark
    * ([[graft.sources.Lakehouse.compactionDue]]). The rewrite
    * costs ∝ table rows while its benefit tracks appended volume, so a
    * pure batch-count cadence tuned on a small table overpays on a big
    * one (MAINT_r13_1000x_nc vs _c8: every-8 rewrites of three
    * 2M-row tables cost more than the slivers they cleared over a
    * 16-batch run). Because the threshold scales with the table, the
    * same ratio defers on a 10× corpus exactly when deferral wins.
    * The default 0 keeps the unconditional cadence.
    *
    * `compactMaxTombstones`: the byte trigger's blind spot is deletes —
    * a tombstone appends ~no bytes but grows the read-side mask
    * sidecar (101k rows between big-table fires in the 48-batch 1000×
    * run), and on a delete-heavy stream the sidecar broadcast becomes
    * the cliff long before appended bytes cross the ratio. When > 0, a
    * cadence tick also folds any table whose sidecar holds ≥ this many
    * tombstone rows, regardless of the byte ratio. 0 = off. */
  def maintainPrefixIndex(
      vecs: DataFrame, corpusDir: String,
      checkpointDir: Option[String] = None,
      upserts: Boolean = true,
      compactEvery: Option[Int] = None,
      compactSliverRatio: Double = 0.0,
      compactMaxTombstones: Long = 0L): StreamingQuery = {
    val s = vecs.sparkSession
    val table = graft.operators.Similarity.prefixIndexTable(s, corpusDir)
    // the frozen quantizer: √K coarse anchors driver-resident, K-row
    // fine side distributed — both derived from the ORIGINAL corpus
    // prefix, never from appended rows
    val corpus = graft.Tables.embeddings(s, corpusDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dot(col("v"), col("v"))))
    // Coarse anchors via the landing's memo/sidecar (r18, guide §1.2 —
    // cut redundant jobs): prefixIndexTable above just landed (or
    // re-registered) the index, so the corpus count is already
    // memo-resident and the coarse anchors are one memoized prefix
    // collect shared with the serve path — where the old
    // collectCoarse() re-paid a corpus count() + its own prefix
    // collect() per maintenance-stream start. This is also the honest
    // "frozen quantizer" semantics: maintenance assigns under the
    // anchors THE LANDING froze rather than re-deriving them. The
    // anchors are bit-identical either way (same first-K1 rows, same
    // sequential-sum norms — the stream==batch assignment parity spec
    // pins that equality).
    val ci = {
      val (n, anchors) = graft.operators.Similarity.frozenCoarse(s, corpusDir)
      val k = graft.operators.Dedup.dd7AnchorCount(n)
      EmbedDedupStream.CoarseIndex(k, graft.operators.Dedup.dd7CoarseCount(k),
        anchors.map(an => (an.id, an.v, an.nrm)))
    }
    val cells = EmbedDedupStream.fineCells(corpus, ci).cache()
    // the commit log's batchId counter is scoped to THIS stream's
    // checkpoint (ADVICE r12): a restart under a new checkpoint dir
    // restarts batchIds at 0, and skipping those against a previous
    // stream's counter would silently drop its first batches. The
    // checkpoint path IS the stream identity — same path ⇒ same
    // batchId sequence ⇒ skip is a true replay; any other identity
    // reads lastBatch = −1 and never skips.
    val identity = checkpointDir.fold("") { cp =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(cp.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    }
    val w = vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (lastBatch, maxSeq) = graft.sources.Lakehouse.readCommits(s, table, identity)
        if (checkpointDir.isDefined && batchId <= lastBatch) {
          // replayed after restart: already applied — skip (idempotence)
        } else {
          val seq = maxSeq + 1
          val dels = batch.filter(col("embedding").isNull).select(col("vec_id"))
          val ups = batch.filter(col("embedding").isNotNull)
          // tombstone first, then append with the same seq: if the batch
          // re-runs after a crash here, the replayed tombstones are
          // byte-equal (same seq) and mask nothing extra.
          // Only ids ALREADY IN the table need a tombstone (ADVICE r12:
          // tombstoning every upsert id made the sidecar — and the
          // read-side broadcast(tmax) — grow with TOTAL appended rows on
          // insert-heavy streams; a first-time insert has no older
          // version to mask). The existence probe is a broadcast
          // semi-join of the micro-batch's ids against one id column of
          // the table — batch side broadcasts, table side scans ids
          // only.
          // sibling index kinds already landed for this corpus receive
          // the SAME maintenance (ADVICE r12: kmeans/ivfpq used to
          // serve stale corpus-only snapshots): frozen-quantizer
          // assignment for km, frozen-codebook encode for ivfpq, and
          // the same tombstones. A kind landed LATER instead catches up
          // at landing time from the prefix table.
          val kmT = graft.operators.Similarity.kmIndexTableIfLanded(s, corpusDir)
          val pqT = graft.operators.Similarity.ivfPqTableIfLanded(s, corpusDir)
          val batchIds = (if (upserts) batch.select(col("vec_id")) else dels).distinct()
          // cached: the existence semi-join scans the table once, not
          // once per sidecar write
          val existing = s.table(table).select(col("vec_id"))
            .join(broadcast(batchIds), Seq("vec_id"), "left_semi").distinct()
            .persist()
          try {
            if (!existing.isEmpty) {
              val trows = existing.select(col("vec_id").as("id"), lit(seq).as("seq"))
              graft.sources.Lakehouse.appendTombstones(s, table, trows)
              kmT.foreach(graft.sources.Lakehouse.appendTombstones(s, _, trows))
              pqT.foreach(graft.sources.Lakehouse.appendTombstones(s, _, trows))
            }
          } finally { existing.unpersist(); () }
          val assigned = assignBatch(ups, ci, cells, seq)
          graft.sources.Lakehouse.appendBucketed(assigned, table)
          if (kmT.isDefined || pqT.isDefined) {
            // the batch's normalized vectors, same expressions as
            // assignBatch — identical doubles everywhere
            val e = ups
              .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
              .withColumn("nrm", sqrt(graft.functions.VectorExprs.dot(col("v"), col("v"))))
            kmT.foreach { t =>
              graft.sources.Lakehouse.appendBucketed(
                graft.operators.Similarity.kmAssignFrame(s, corpusDir, e)
                  .join(e, Seq("vec_id"))
                  .select(col("cell"), col("vec_id"), col("v"), col("nrm"), lit(seq).as("seq")),
                t)
            }
            pqT.foreach { t =>
              graft.sources.Lakehouse.appendBucketed(
                assigned.select(col("cell"), col("vec_id"), col("seq"))
                  .join(graft.operators.Similarity.pqCodeArrays(s, corpusDir, e), Seq("vec_id"))
                  .select(col("cell"), col("vec_id"), col("codes"), col("seq")),
                t)
            }
          }
          graft.sources.Lakehouse.writeCommits(s, table, batchId, seq, identity)
          kmT.foreach(s.catalog.refreshTable)
          pqT.foreach(s.catalog.refreshTable)
          if (compactEvery.exists(n => n > 0 && batchId > 0 && batchId % n == 0)) {
            // refresh first: compaction's growth guard compares row
            // counts around the rewrite, and a relation cached from
            // before this batch's append under-counts the snapshot
            s.catalog.refreshTable(table)
            // per-table volume trigger: tables whose sliver population
            // does not yet justify a full rewrite skip this tick
            (Seq(table) ++ kmT ++ pqT).foreach { t =>
              val volumeDue = compactSliverRatio <= 0 ||
                graft.sources.Lakehouse.compactionDue(s, t, compactSliverRatio)
              // delete-heavy guard: tombstones add no bytes, so the mask
              // sidecar can outgrow its broadcast long before the ratio
              lazy val tombsDue = compactMaxTombstones > 0 &&
                graft.sources.Lakehouse.tombstones(s, t)
                  .exists(_.count() >= compactMaxTombstones)
              if (volumeDue || tombsDue)
                graft.sources.Lakehouse.compactMaintained(s, t, "vec_id")
            }
          }
        }
        // the insert runs in the micro-batch's CLONED session; its
        // refresh does not touch the serving session's relation cache,
        // so invalidate there — commit-then-visible, the IQ contract
        s.catalog.refreshTable(table)
      }
    checkpointDir.foreach(cp => w.option("checkpointLocation", cp))
    val q = w.start()
    // release the quantizer cache when THIS query terminates (ADVICE
    // r11: it leaked per invocation in a long-lived session)
    s.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == q.id) { cells.unpersist(); s.streams.removeListener(this) }
    })
    q
  }
}
