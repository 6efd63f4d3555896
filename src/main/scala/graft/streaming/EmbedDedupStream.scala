package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming embedding dedup-at-ingest — the stream twin of dd7's
  * two-level IVF-cell near-dup mining, completing what [[DedupStream]]
  * does for text: embeddings arrive on a stream, verified cosine
  * near-dup pairs come out incrementally, equal to the batch dd7 pair
  * set over the same corpus.
  *
  * Per arriving vector:
  *  1. cast to double + norm with the batch's exact expressions
  *     (sequential dot, sqrt — Similarity.withNorm's arithmetic);
  *  2. rank the K1 = ⌈√K⌉ coarse cells, keep Dd7CoarseProbes, refine
  *     against only those cells' fine anchors and keep the Dd7Probes
  *     best fine cells — every ranking (cos DESC, id ASC), replicating
  *     the batch TopKAgg / row_number ordering bit-exactly in tight
  *     loops over the broadcast [[AnchorIndex]];
  *  3. cell membership lives in the [[LshBucketProcessor]] ListState
  *     (band = 0, bucket = fine cell id) and emits candidate pairs on
  *     arrival;
  *  4. exact cosine verification against the static normalized corpus
  *     (stream-static join), dd7's threshold and rounding verbatim.
  *
  * Scale: state is (cell → member ids), ids only; per-vector assignment
  * work is (K1 + Dd7CoarseProbes·K/K1)·d ≈ √K·d multiply-adds — the
  * two-level trade dd7 documents — instead of the flat K·d. Only the
  * √K coarse array must live whole on every executor; the fine map is
  * the same cid-grouped table the batch joins by cid, shipped here as
  * one broadcast (shard it across a distributed store when K itself
  * outgrows executor memory). Vectors cross a shuffle only for
  * candidate verification.
  */
object EmbedDedupStream {

  /** Two-level anchor index of the STATIC corpus (aid/cid ascending):
    * coarse anchors — K1 = ⌈√K⌉, so this array and the per-row coarse
    * scan grow sublinearly in n forever — and the fine anchors grouped
    * by their single nearest coarse cell (the batch a2c, replayed with
    * the identical (cos DESC, cid ASC) ranking). */
  final case class AnchorIndex(
      coarse: Array[(Long, Array[Double], Double)],
      fineByCell: Map[Long, Array[(Long, Array[Double], Double)]])

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Driver-collected two-level index of the STATIC corpus — the stream
    * twin of dd7's anchor tables. The a2c grouping runs as one K·K1
    * driver loop (the batch computes the same thing distributed; K·K1 ≈
    * K^1.5 multiply-adds is index-build cost, paid once). */
  def collectAnchors(embeddings: DataFrame): AnchorIndex = {
    val e = embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val k = graft.operators.Dedup.dd7AnchorCount(e.count())
    val k1 = graft.operators.Dedup.dd7CoarseCount(k)
    val fine = e.filter(col("vec_id") < k)
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v, math.sqrt(dot(v, v)))
      }
      .sortBy(_._1)
    val coarse = fine.filter(_._1 < k1)
    val fineByCell = fine.groupBy { case (_, av, an) =>
      coarse.map { case (cid, cv, cn) => (dot(av, cv) / (an * cn), cid) }
        .minBy { case (cos, cid) => (-cos, cid) }._2
    }
    AnchorIndex(coarse, fineByCell)
  }

  /** (band=0, bv=fine cell, doc_id=vec_id) assignments for an embedding
    * stream — reuses [[LshBucketProcessor]]'s input shape so the same
    * bucket state machine serves both modalities. */
  def assignments(vecs: DataFrame, index: AnchorIndex): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val probes = graft.operators.Dedup.Dd7Probes
    val coarseProbes = graft.operators.Dedup.Dd7CoarseProbes
    val idx = s.sparkContext.broadcast(index)
    vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val ix = idx.value
        val nrm = math.sqrt(dot(v, v))
        // level 1: top `coarseProbes` coarse cells by (cos DESC, cid ASC)
        val probed = ix.coarse
          .map { case (cid, cv, cn) => (dot(v, cv) / (nrm * cn), cid) }
          .sortBy { case (cos, cid) => (-cos, cid) }
          .take(coarseProbes)
        // level 2: top `probes` fine cells among ONLY those coarse
        // cells' anchors, by (cos DESC, aid ASC)
        probed.iterator
          .flatMap { case (_, cid) => ix.fineByCell.getOrElse(cid, Array.empty) }
          .map { case (aid, av, an) => (dot(v, av) / (nrm * an), aid) }
          .toArray
          .sortBy { case (cos, aid) => (-cos, aid) }
          .take(probes)
          .map { case (_, aid) => BandDoc(0, aid, id) }
      }
      .toDF()
  }

  /** Verified near-dup pairs stream — the full dd7 twin. `normedStore`
    * is the static normalized corpus: (vec_id, v, nrm), i.e. the same
    * table the batch verify joins. */
  def verifiedPairs(vecs: DataFrame, normedStore: DataFrame): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val index = collectAnchors(normedStore.select(col("vec_id"), col("v").as("embedding")))
    assignments(vecs, index).as[BandDoc]
      .groupByKey(b => (b.band, b.bv))
      .transformWithState(new LshBucketProcessor, org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[CandPair])
      .toDF()
      .join(normedStore.select(col("vec_id").as("d1"), col("v").as("v1"), col("nrm").as("n1")), Seq("d1"))
      .join(normedStore.select(col("vec_id").as("d2"), col("v").as("v2"), col("nrm").as("n2")), Seq("d2"))
      .withColumn("cos", graft.functions.VectorExprs.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= 0.4)
      .select(col("d1").as("id1"), col("d2").as("id2"), round(col("cos"), 3).as("cos_sim"))
  }
}
