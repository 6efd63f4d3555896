package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One banded signature coordinate of an arriving document. */
final case class BandDoc(band: Int, bv: Long, doc_id: Long)

/** An unverified near-dup candidate pair (d1 < d2), or — when d1 ==
  * [[LshBucketProcessor.OverflowD1]] — an overflow marker whose d2 is
  * the bucket's cumulative count of arrivals dropped by the size cap. */
final case class CandPair(d1: Long, d2: Long)

object LshBucketProcessor {
  /** Default bucket-size cap. LSH pair fan-out is O(|bucket|²) — fine
    * for genuine near-dup families (bounded by the corpus's dup rate),
    * unbounded for adversarial skew (e.g. a constant boilerplate
    * segment hashing every doc into one band bucket). 1024 members =
    * ≤ ~0.5M pairs from one bucket, past which arrivals are counted,
    * not joined. */
  val DefaultMaxBucket = 1024

  /** d1 of an overflow marker row (no real doc_id is negative; the
    * verification join drops markers naturally, monitors filter for
    * them). */
  val OverflowD1: Long = -1L
}

/** LSH bucket membership as streaming state: keyed by (band, band-hash),
  * each bucket holds the doc_ids seen so far; a new arrival emits one
  * candidate pair against every existing member, then joins the bucket.
  * State per key is the bucket's membership — the same rows the batch
  * banding join materializes, held incrementally. A pair that shares
  * several bands is emitted once per shared band (the batch form
  * `distinct()`s; streaming consumers dedup downstream or tolerate
  * re-verification — verification is idempotent).
  *
  * Skew hardening: membership is MapState keyed by doc_id (O(1) dedup
  * of redelivered rows, not a scan of the bucket), and a bucket that
  * reaches `maxBucket` members stops admitting — each dropped arrival
  * emits one [[LshBucketProcessor.OverflowD1]] marker carrying the
  * cumulative drop count instead of O(|bucket|) pairs, so a degenerate
  * band value (constant boilerplate segment) costs O(1) state and
  * output per arrival instead of growing one row and O(|bucket|²)
  * emission without bound. A capped doc keeps its other NumBands−1
  * buckets, so recall under the cap degrades only for pairs whose
  * EVERY shared band is flooded.
  *
  * CHECKPOINT COMPATIBILITY: round 8 changed the state layout from
  * `ListState[Long] "docs"` to a `"docs"` MapState plus the `"meta"`
  * ValueState, and round 10 widened the map value to the admit
  * timestamp (TTL support) — a streaming query CANNOT resume a
  * checkpoint written by an earlier layout (state-schema validation
  * rejects the type change on the reused name). Restart such pipelines
  * from a fresh checkpoint and re-feed the corpus (the processor dedups
  * by doc_id, so a replay is idempotent).
  *
  * Drop accounting under redelivery: a doc REJECTED by the cap is never
  * admitted to the MapState, so an at-least-once redelivery of the same
  * doc_id increments `dropped` again — the cumulative count on the
  * overflow markers can over-count under redelivery. That is the
  * deliberate trade: remembering capped doc_ids would grow state without
  * bound, exactly what the cap exists to prevent. Read the marker count
  * as "drop events", not "distinct docs dropped".
  *
  * Replay idempotence UNDER TTL (ADVICE r10): with a TTL set, a doc
  * whose bucket entry has expired and is later redelivered is
  * re-admitted as new and re-pairs with the bucket's live members — the
  * same (d1, d2) CandPair can therefore be emitted once per TTL era,
  * not once ever. "Replay is idempotent" holds exactly within one era
  * (a redelivery while the entry is live emits nothing). Consumers
  * running with a TTL should treat the candidate stream as
  * at-least-once per pair and dedup downstream (the batch verify step
  * dd3 feeds candidates into already does). */
class LshBucketProcessor(maxBucket: Int = LshBucketProcessor.DefaultMaxBucket,
    ttl: Option[StateTtl] = None)
  extends StatefulProcessor[(Int, Long), BandDoc, CandPair] {
  // doc_id -> admit timestamp (0 when no TTL). CHECKPOINT COMPATIBILITY:
  // round 10 changed the map value from Boolean to Long (the admit ts) —
  // checkpoints from the round-8/9 layout cannot resume (state-schema
  // validation rejects the value-type change on the reused name).
  @transient private var docs: MapState[Long, Long] = _
  @transient private var meta: ValueState[(Long, Long)] = _ // (size, dropped)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    docs = getHandle.getMapState[Long, Long](
      "docs", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    meta = getHandle.getValueState[(Long, Long)](
      "meta", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
  }

  override def handleInputRows(
      key: (Int, Long), rows: Iterator[BandDoc], timerValues: TimerValues): Iterator[CandPair] = {
    var (size, dropped) = if (meta.exists()) meta.get() else (0L, 0L)
    val out = Vector.newBuilder[CandPair]
    // Optional state TTL ([[StateTtl]], reference TtlProvider analog):
    // members idle past the TTL expire at read — a long-running ingest's
    // bucket state tracks the RECENT corpus, not all of history. Expiry
    // runs once per (key, batch) before admissions: expired members stop
    // pairing, `size` shrinks with them, so a previously capped bucket
    // re-opens as its members age out.
    ttl.foreach { t =>
      val dead = Vector.newBuilder[Long]
      docs.iterator().foreach { case (m, ts) => if (t.expired(ts)) dead += m }
      val d = dead.result()
      d.foreach(docs.removeKey)
      size -= d.size
    }
    rows.foreach { r =>
      if (!docs.containsKey(r.doc_id)) {
        if (size >= maxBucket) {
          dropped += 1
          out += CandPair(LshBucketProcessor.OverflowD1, dropped)
        } else {
          docs.keys().foreach { m =>
            out += (if (m < r.doc_id) CandPair(m, r.doc_id) else CandPair(r.doc_id, m))
          }
          docs.updateValue(r.doc_id, ttl.map(_.clock()).getOrElse(0L))
          size += 1
        }
      }
    }
    meta.update((size, dropped))
    out.result().iterator
  }
}

/** Streaming dedup-at-ingest — the stream twin of the batch MinHash+LSH
  * pipeline (dd3), the reference-pattern the whole training-data surface
  * is built around: documents arrive on a stream, and near-duplicate
  * PAIRS come out incrementally, bit-identical to what the batch index
  * would have found over the same corpus.
  *
  * Per arriving document (all per-ROW, no streaming aggregation):
  *  1. word-3gram shingles (the SAME typed-map construction the batch
  *     index uses — Dedup.withShingles's exact string ops);
  *  2. gram hashes via xxhash64, signature via [[graft.functions.MinHashArray]]
  *     — the scalar twin of the batch MinHashAgg, property-pinned equal;
  *  3. banding with the batch's exact band expression
  *     (xxhash64 over BandRows-slot signature slices);
  *  4. [[LshBucketProcessor]] holds bucket membership in ListState and
  *     emits candidate pairs on arrival;
  *  5. exact-Jaccard verification against a CONTENT STORE (stream-static
  *     join to the batch gram-set index — at production scale, the
  *     lakehouse table the same ingest maintains), with the identical
  *     sorted-intersect expression and threshold dd3 ships.
  *
  * Scale: per-doc work is O(len + NumHashes·grams); banding state is the
  * corpus's bucket membership (ids only, never text/arrays); candidate
  * emission touches only colliding buckets. The content-store join ships
  * gram arrays only for candidate docs — the batch verify's exact cost
  * shape, incrementalized.
  */
object DedupStream {
  import graft.operators.Dedup.{BandRows, JaccardThreshold, NumBands, NumHashes}

  /** (doc_id, mh) per-row signatures for a (doc_id, text) stream —
    * stage 1-2. Public so tests can pin stream==batch signatures. */
  def signatures(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => // verbatim Dedup.withShingles string ops
        val ws = text.split(' ')
        val grams =
          if (ws.length < 3) Array.empty[String]
          else Array.tabulate(ws.length - 2)(i => ws(i) + " " + ws(i + 1) + " " + ws(i + 2)).distinct
        (id, grams)
      }
      // gram-less docs (<3 words) never enter the batch index (explode
      // of an empty array drops them) — drop them here too, or they'd
      // all share one degenerate all-MaxValue signature and pile into
      // the same 32 LSH buckets, O(n²) candidates from nothing
      .filter(_._2.nonEmpty)
      .toDF("doc_id", "grams")
      .select(col("doc_id"),
        graft.functions.SketchAggs.minhashArray(
          expr("transform(grams, g -> xxhash64(g))"), NumHashes).as("mh"))
  }

  /** Candidate pairs stream — stages 3-4. May contain cross-band
    * duplicates (see LshBucketProcessor) and, under adversarial bucket
    * skew, OverflowD1 marker rows.
    *
    * RETURN CONTRACT: rows with `d1 == LshBucketProcessor.OverflowD1`
    * are overflow MARKERS (d2 = cumulative drop-event count), not
    * candidate pairs. The verification join in [[verifiedPairs]] drops
    * them naturally (no doc has a negative id); any OTHER consumer of
    * this stream must filter `d1 >= 0` before treating rows as pairs. */
  def candidates(docs: DataFrame,
      maxBucket: Int = LshBucketProcessor.DefaultMaxBucket,
      ttl: Option[StateTtl] = None): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    signatures(docs)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, ${NumBands - 1}),
           | b -> struct(b AS band, xxhash64(slice(mh, b * $BandRows + 1, $BandRows)) AS bv))""".stripMargin)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bv").as("bv"), col("doc_id")).as[BandDoc]
      .groupByKey(b => (b.band, b.bv))
      .transformWithState(new LshBucketProcessor(maxBucket, ttl), TimeMode.None(), OutputMode.Update(),
        Encoders.product[CandPair])
      .toDF()
  }

  /** Verified near-dup pairs stream — the full dd3 twin. `gramSets` is
    * the static content store: (doc_id, ghs sorted gram-hash array, sz),
    * i.e. Dedup.gramSets for the same corpus. `maxBucket` is threaded to
    * [[LshBucketProcessor]]; under a finite cap, batch parity holds only
    * for corpora whose every band bucket stays below it (capped losses
    * are invisible here — overflow markers are dropped by the
    * verification join; monitor [[candidates]] directly to see them). */
  def verifiedPairs(docs: DataFrame, gramSets: DataFrame,
      maxBucket: Int = LshBucketProcessor.DefaultMaxBucket,
      ttl: Option[StateTtl] = None): DataFrame =
    candidates(docs, maxBucket, ttl)
      .join(gramSets.select(col("doc_id").as("d1"), col("ghs").as("ghs1"), col("sz").as("sz1")), Seq("d1"))
      .join(gramSets.select(col("doc_id").as("d2"), col("ghs").as("ghs2"), col("sz").as("sz2")), Seq("d2"))
      .withColumn("inter", graft.functions.VectorExprs.sortedIntersect(col("ghs1"), col("ghs2")))
      .withColumn("jac",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("d1"), col("d2"), round(col("jac"), 3).as("jaccard"))
}
