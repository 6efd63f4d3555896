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
  * assign it — the table stays bit-equal to a from-scratch landing of
  * corpus ∪ appends (spec-pinned in IndexIngestSpec), and the landing
  * fingerprint stays valid because the quantizer inputs (the ORIGINAL
  * corpus prefix) are untouched by appends.
  *
  * Scale shape:
  *  - per arriving vector: (K1 + probes·K/K1)·d ≈ √K·d multiply-adds —
  *    the same two-level assignment [[EmbedDedupStream]] runs for
  *    dedup-at-ingest (level 1 against the broadcast √K coarse array,
  *    level 2 via the distributed cid-keyed fine-cell join);
  *  - per micro-batch: ONE bucketed append — files land hashed and
  *    named by bucket id, so bucket pruning and Exchange-free joins
  *    keep working across old and new rows;
  *  - file slivers (one per bucket per batch) are bounded by
  *    [[graft.sources.Lakehouse.compactBucketed]], the bucketed twin
  *    of the compaction every incremental sink needs.
  */
object IndexIngest {

  /** Assign one batch of raw vectors (vec_id, embedding: float array)
    * to the frozen quantizer's cells and return serving-index rows
    * (cell, vec_id, v, nrm) — [[EmbedDedupStream.assignments]]'s
    * multi-assignment (bv = fine cell) joined back to the vector
    * payload, with the norm computed by the batch pipeline's exact
    * expressions so served cosines are bit-identical for old and new
    * rows. */
  private[graft] def assignBatch(
      batch: DataFrame,
      ci: EmbedDedupStream.CoarseIndex,
      cells: DataFrame): DataFrame = {
    val normed = batch
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dot(col("v"), col("v"))))
    EmbedDedupStream.assignments(batch, ci, cells)
      .select(col("bv").as("cell"), col("doc_id").as("vec_id"))
      .join(normed, Seq("vec_id"))
      .select(col("cell"), col("vec_id"), col("v"), col("nrm"))
  }

  /** Start the maintenance stream: `vecs` (a streaming DataFrame of
    * (vec_id, embedding)) → frozen-quantizer assignment → bucketed
    * append into `corpusDir`'s landed prefix index (landed first if
    * absent). Returns the running query; each committed micro-batch is
    * immediately visible to [[graft.operators.Similarity]]'s served
    * queries (`insertInto` refreshes the catalog relation).
    *
    * The caller owns vec_id uniqueness: an id already present in the
    * index is appended as a second row set, and served top-k — which
    * dedups by id — would silently keep one. Upserts need a delete+
    * append compaction pass, not this hot path. */
  def maintainPrefixIndex(
      vecs: DataFrame, corpusDir: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val s = vecs.sparkSession
    val table = graft.operators.Similarity.prefixIndexTable(s, corpusDir)
    // the frozen quantizer: √K coarse anchors driver-resident, K-row
    // fine side distributed — both derived from the ORIGINAL corpus
    // prefix, never from appended rows
    val corpus = graft.Tables.embeddings(s, corpusDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dot(col("v"), col("v"))))
    val ci = EmbedDedupStream.collectCoarse(
      corpus.select(col("vec_id"), col("v").as("embedding")))
    val cells = EmbedDedupStream.fineCells(corpus, ci).cache()
    val w = vecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.Lakehouse.appendBucketed(assignBatch(batch, ci, cells), table)
        // the insert runs in the micro-batch's CLONED session; its
        // refresh does not touch the serving session's relation cache,
        // so invalidate there — commit-then-visible, the IQ contract
        s.catalog.refreshTable(table)
      }
    checkpointDir.foreach(cp => w.option("checkpointLocation", cp))
    w.start()
  }
}
