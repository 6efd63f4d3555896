package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming embedding dedup-at-ingest — the stream twin of dd7's
  * IVF-cell near-dup mining, completing what [[DedupStream]] does for
  * text: embeddings arrive on a stream, verified cosine near-dup pairs
  * come out incrementally, equal to the batch dd7 pair set over the
  * same corpus.
  *
  * Per arriving vector:
  *  1. cast to double + norm with the batch's exact expressions
  *     (sequential dot, sqrt — Similarity.withNorm's arithmetic);
  *  2. assign to its nearest Dd7Probes cells against the same
  *     deterministic anchor set the batch uses (first
  *     dd7AnchorCount(n) vec_ids), ranked by (cos DESC, aid ASC) — the
  *     TopKAgg / row_number ordering, replicated in one tight loop over
  *     the driver-collected anchor array (the anchor table is small by
  *     construction: K ≈ n/64 rows of d doubles, the same thing the
  *     batch broadcasts);
  *  3. cell membership lives in the [[LshBucketProcessor]] ListState
  *     (band = 0, bucket = cell id) and emits candidate pairs on
  *     arrival;
  *  4. exact cosine verification against the static normalized corpus
  *     (stream-static join), dd7's threshold and rounding verbatim.
  *
  * Scale: state is (cell → member ids), ids only; per-vector assignment
  * work is K·d multiply-adds (the IVF trade dd7 already documents);
  * candidate emission touches only co-resident cells; vectors cross a
  * shuffle only for candidate verification.
  */
object EmbedDedupStream {

  /** Driver-collected anchor set of the STATIC corpus: (aid, vector,
    * norm), aid-ascending — the stream twin of dd7's broadcast anchor
    * table (bounded: K = max(256, ⌈n/64⌉) rows). */
  def collectAnchors(embeddings: DataFrame): Array[(Long, Array[Double], Double)] = {
    val e = embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val k = graft.operators.Dedup.dd7AnchorCount(e.count())
    e.filter(col("vec_id") < k)
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (r.getLong(0), v, math.sqrt(s))
      }
      .sortBy(_._1)
  }

  /** (band=0, bv=cell, doc_id=vec_id) assignments for an embedding
    * stream — reuses [[LshBucketProcessor]]'s input shape so the same
    * bucket state machine serves both modalities. */
  def assignments(vecs: DataFrame, anchors: Array[(Long, Array[Double], Double)]): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val probes = graft.operators.Dedup.Dd7Probes
    vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        var nsq = 0.0; var i = 0
        while (i < v.length) { nsq += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(nsq)
        // cos against every anchor, then top `probes` by (cos DESC, aid ASC)
        val scored = anchors.map { case (aid, av, an) =>
          var d = 0.0; var j = 0
          val n = math.min(v.length, av.length)
          while (j < n) { d += v(j) * av(j); j += 1 }
          (d / (nrm * an), aid)
        }
        scored.sortBy { case (cos, aid) => (-cos, aid) }.take(probes)
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
    val anchors = collectAnchors(normedStore.select(col("vec_id"), col("v").as("embedding")))
    assignments(vecs, anchors).as[BandDoc]
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
