package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** SimHash near-dup detection: a 64-bit signature per document from its
  * term-frequency-weighted word hashes; candidate pairs come from the
  * shared MinHash/LSH banding (Dedup.lshCandidates), the simhash hamming
  * distance is the cheap secondary filter, and survivors are verified
  * with exact n-gram Jaccard (same contract as Dedup.dd3).
  *
  * TF weighting matters here: the fixture documents all draw on one
  * small vocabulary, so an unweighted (set-based) simhash collapses —
  * term counts are what distinguish documents.
  *
  * Why NOT block on simhash's own 8-bit bands: on a low-entropy corpus
  * the 256-value bands are unselective — the round-1 10× scale probe
  * measured ~78 M band-join candidates (85 s), a data-dependent
  * scale-killer. MinHash bands hash 4 × 64-bit slots, so band-value
  * collisions track Jaccard similarity, not vocabulary skew; candidate
  * counts stay proportional to true near-dup pairs at any corpus size.
  * The simhash signature keeps earning its keep as an O(1)-per-pair
  * hamming filter between blocking and the exact-Jaccard join.
  *
  * Hamming cut 14: fixture true pairs peak at hamming 12 (sf0.1) / 5
  * (sf0.01); a miss would need a ≥0.89-Jaccard pair at hamming ≥ 15.
  *
  * Scale: signatures build in one keyed TypedImperativeAggregate
  * (512-byte buffers); blocking is the shared memoized LSH shuffle;
  * signatures broadcast (8 bytes/doc) to the candidate stream; exact
  * verification touches surviving candidates only, never n².
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
      val cand = Dedup.lshCandidates(s, d)
        .join(broadcast(sig.select(col("doc_id").as("d1"), col("sig").as("sig1"))), Seq("d1"))
        .join(broadcast(sig.select(col("doc_id").as("d2"), col("sig").as("sig2"))), Seq("d2"))
        .filter(expr("bit_count(sig1 ^ sig2)") <= MaxHamming)
        .select("d1", "d2")
      Dedup.verifyJaccard(s, d, cand)
    },
    Some(Dedup.jaccardOracle)
  )

  val all: Seq[QueryDef] = Seq(dd5)
}
