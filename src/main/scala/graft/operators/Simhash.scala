package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** SimHash near-dup detection: a 64-bit signature per document from its
  * term-frequency-weighted word hashes; candidate pairs block on 8-bit
  * signature bands and a hamming-distance cut, then are verified with
  * exact n-gram Jaccard (same contract as MinHash/LSH in Dedup.dd3).
  *
  * TF weighting matters here: the fixture documents all draw on one
  * small vocabulary, so an unweighted (set-based) simhash collapses —
  * term counts are what distinguish documents.
  *
  * Scale: one pass builds signatures (64 conditional-sum aggregates in a
  * single aggregation); blocking shuffles on (band, byte) only; exact
  * verification touches candidate pairs, never n².
  *
  * Oracle = exhaustive Jaccard (valid because verified candidates at the
  * fixture's similarity levels have recall 1, like dd3 — asserted by the
  * driver's differential check itself).
  */
object Simhash {
  val MaxHamming = 16

  val dd5 = QueryDef(
    "dd5_dedup_simhash",
    (s, d) => {
      val words = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        .withColumn("h", xxhash64(col("w")))
      // signature bit b: sign of Σ_words tf · (±1 by bit b of word hash)
      val bitSums = (0 until 64).map { b =>
        sum(when(expr(s"(h >> $b) & 1") === 1, col("tf")).otherwise(-col("tf"))).as(s"s$b")
      }
      val sigExpr = (0 until 64)
        .map(b => s"IF(s$b > 0, CAST(1 AS BIGINT) << $b, CAST(0 AS BIGINT))")
        .mkString(" | ")
      val sig = words.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .withColumn("sig", expr(sigExpr))
        .select("doc_id", "sig")
      // block on 8 bands of 8 bits each
      val banded = sig.select(col("doc_id"), col("sig"),
          explode(array((0 until 8).map(b =>
            struct(lit(b).as("band"), expr(s"(sig >> ${b * 8}) & 255").as("bv"))): _*)).as("bk"))
        .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.bv").as("bv"))
      val cand = banded.select(col("doc_id").as("d1"), col("sig").as("sig1"), col("band"), col("bv"))
        .join(banded.select(col("doc_id").as("d2"), col("sig").as("sig2"), col("band"), col("bv")),
          Seq("band", "bv"))
        .filter(col("d1") < col("d2"))
        .select("d1", "d2", "sig1", "sig2").distinct()
        .withColumn("hamming", expr("bit_count(sig1 ^ sig2)"))
        .filter(col("hamming") <= MaxHamming)
        .select("d1", "d2")
      // verify candidates with exact n-gram Jaccard (same as dd3)
      Dedup.verifyJaccard(s, d, cand)
    },
    Some(Dedup.jaccardOracle)
  )

  val all: Seq[QueryDef] = Seq(dd5)
}
