package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** SimHash near-dup detection: a 64-bit signature per document from its
  * term-frequency-weighted word hashes; candidates block on 8-bit
  * signature bands + a hamming cut, pass a MinHash-estimate prefilter,
  * and are verified with exact n-gram Jaccard (same contract as
  * Dedup.dd3).
  *
  * TF weighting matters here: the fixture documents all draw on one
  * small vocabulary, so an unweighted (set-based) simhash collapses —
  * term counts are what distinguish documents. Even weighted, hamming
  * distance discriminates weakly on such a corpus (random pairs reach
  * hamming ≤ 14 often), which is why the cheap MinHash prefilter sits
  * between blocking and the exact-Jaccard join: it cuts ~99.97% of the
  * false candidates for the cost of one broadcast lookup + an array
  * compare per pair.
  *
  * Hamming cut 14: fixture true pairs peak at hamming 12 (sf0.1) / 5
  * (sf0.01); a miss would need a ≥0.89-Jaccard pair at hamming ≥ 15.
  *
  * Scale: signatures build in two keyed aggregations (explode bit index
  * → signed tf sums → pack bits); blocking shuffles on (band, byte);
  * exact verification touches surviving candidates only, never n².
  */
object Simhash {
  val MaxHamming = 14

  val dd5 = QueryDef(
    "dd5_dedup_simhash",
    (s, d) => {
      // signature bit b: sign of Σ ±1 over word *occurrences* (occurrence
      // summing = tf weighting), via the SimHashAgg
      // TypedImperativeAggregate: one partial-agg shuffle of 512-byte
      // buffers per doc.
      val sig = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id")
        .agg(graft.functions.SketchAggs.simhash(xxhash64(col("w"))).as("sig"))
      // block on 8 bands of 8 bits each
      val banded = sig.select(col("doc_id"), col("sig"),
          explode(expr("transform(sequence(0, 7)," +
            " b -> struct(b AS band, shiftright(sig, b * 8) & 255 AS bv))")).as("bk"))
        .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.bv").as("bv"))
      // hamming cut BEFORE the dedup so the distinct sees only surviving
      // (d1, d2) longs, not wide signature rows
      val cand = banded.select(col("doc_id").as("d1"), col("sig").as("sig1"), col("band"), col("bv"))
        .join(banded.select(col("doc_id").as("d2"), col("sig").as("sig2"), col("band"), col("bv")),
          Seq("band", "bv"))
        .filter(col("d1") < col("d2") &&
          expr("bit_count(sig1 ^ sig2)") <= MaxHamming)
        .select("d1", "d2").distinct()
      // cheap MinHash-estimate prefilter, then exact n-gram Jaccard
      Dedup.verifyJaccard(s, d, Dedup.minhashPrefilter(s, d, cand))
    },
    Some(Dedup.jaccardOracle)
  )

  val all: Seq[QueryDef] = Seq(dd5)
}
