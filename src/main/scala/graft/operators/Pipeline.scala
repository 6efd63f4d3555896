package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The flagship training-data curation pipeline, composed from the
  * engine's own operators in one query — the shape a 100 TB pretraining
  * corpus actually runs:
  *
  *   1. near-dup clustering (MinHash/LSH + connected components, dd6)
  *      → keep only each cluster's canonical document;
  *   2. heuristic quality scoring (tx3 formula) → threshold filter;
  *   3. token statistics + BPE size estimate (tx1);
  *   4. n-gram topic/language classification (tx2).
  *
  * Everything stays declarative, so the stages fuse: the quality/stats/
  * classification projections run in one pass over the canonical set.
  * The quality threshold (0.57) is compared on the UNROUNDED double in
  * both engines (fixture margin to the threshold ≥ 8.6e-4, far above
  * cross-engine ulp noise).
  */
object Pipeline {
  val QualityThreshold = 0.57

  val td1 = QueryDef(
    "td1_curation_pipeline",
    (s, d) => {
      val canonical = Dedup.clusters(s, d)
        .filter(col("doc_id") === col("canonical_id"))
        .select("doc_id")
      var df = Tables.documents(s, d)
        .join(canonical, Seq("doc_id"))
        .withColumn("ws", split(col("text"), " "))
        .withColumn("n_tok", size(col("ws")))
        .withColumn("n_dis", size(array_distinct(col("ws"))))
        .withColumn("n_stop", expr(TextOps.cnt("the")) + expr(TextOps.cnt("a")))
        .withColumn("quality",
          least(col("n_tok") / 50.0, lit(1.0)) * 0.4 +
            (col("n_dis") / col("n_tok")) * 0.4 +
            (lit(1.0) - col("n_stop") / col("n_tok")) * 0.2)
      for ((name, words) <- TextOps.classes)
        df = df.withColumn(name, expr(words.map(TextOps.cnt).mkString(" + ")))
      val Seq(a, b, c, dd) = TextOps.classes.map(_._1)
      df.filter(col("quality") >= QualityThreshold)
        .select(
          col("doc_id"),
          col("n_tok").cast("int").as("n_tokens"),
          ceil(length(col("text")) / 4.0).cast("long").as("bpe_est"),
          round(col("quality"), 4).as("quality"),
          expr(s"""CASE WHEN $a >= $b AND $a >= $c AND $a >= $dd THEN '$a'
                  |     WHEN $b >= $c AND $b >= $dd THEN '$b'
                  |     WHEN $c >= $dd THEN '$c' ELSE '$dd' END""".stripMargin).as("predicted"))
    },
    Some {
      val cols = TextOps.classes.map { case (name, words) =>
        s"  ${words.map(TextOps.cntSql).mkString(" + ")} AS $name"
      }.mkString(",\n")
      val Seq(a, b, c, dd) = TextOps.classes.map(_._1)
      s"""WITH RECURSIVE w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
         |       FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) ix),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
         |          FROM sh a JOIN sh b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |dup AS (SELECT d1, d2 FROM pairs
         |        JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |        WHERE inter * 1.0 / (s1.n + s2.n - inter) >= ${Dedup.JaccardThreshold}),
         |und AS (SELECT d1 AS a, d2 AS b FROM dup UNION SELECT d2, d1 FROM dup),
         |reach(a, b) AS (SELECT a, b FROM und
         |                UNION
         |                SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         |mins AS (SELECT a, min(b) AS mn FROM reach GROUP BY a),
         |canon AS (SELECT ww.doc_id FROM w ww LEFT JOIN mins m ON ww.doc_id = m.a
         |          WHERE least(ww.doc_id, coalesce(m.mn, ww.doc_id)) = ww.doc_id),
         |t AS (SELECT w.doc_id, w.text, w.ws,
         |        len(ws) AS n_tok, len(list_distinct(ws)) AS n_dis,
         |        ${TextOps.cntSql("the")} + ${TextOps.cntSql("a")} AS n_stop,
         |$cols
         |      FROM w JOIN canon ON w.doc_id = canon.doc_id),
         |q AS (SELECT *,
         |        least(n_tok / 50.0, 1.0) * 0.4 + (n_dis * 1.0 / n_tok) * 0.4 +
         |        (1.0 - n_stop * 1.0 / n_tok) * 0.2 AS quality
         |      FROM t)
         |SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tokens,
         |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est,
         |  round(quality, 4) AS quality,
         |  CASE WHEN $a >= $b AND $a >= $c AND $a >= $dd THEN '$a'
         |       WHEN $b >= $c AND $b >= $dd THEN '$b'
         |       WHEN $c >= $dd THEN '$c' ELSE '$dd' END AS predicted
         |FROM q WHERE quality >= ${QualityThreshold}""".stripMargin
    }
  )

  /** td2 — benchmark decontamination: the train/eval-overlap check every
    * pretraining pipeline runs before shipping a corpus. The held-out
    * "benchmark" is the q35 deterministic test split (md5 bucket ≥ 240 —
    * content-stable, so both engines and any rerun agree on membership);
    * every remaining document reports how many of its word-3-gram
    * shingles appear anywhere in the benchmark, and is flagged
    * contaminated at ≥ 20% overlap.
    *
    * Scale: the benchmark gram set is tiny relative to the corpus
    * (eval sets are thousands of docs, the corpus billions), so it
    * BROADCASTS to the corpus gram stream — the corpus is never
    * shuffled; one partial-agg count per doc closes the plan. Gram
    * matching is on 64-bit hashes (same contract as dd2/dd3). */
  val td2 = QueryDef(
    "td2_decontamination",
    (s, d) => {
      val (g, sizes) = Dedup.gramTable(s, d)
      val bucket = conv(substring(md5(col("text")), 1, 2), 16, 10).cast("int")
      val benchIds = Tables.documents(s, d)
        .filter(bucket >= 240).select(col("doc_id"))
      val benchGrams = g.join(broadcast(benchIds), Seq("doc_id"))
        .select(col("gh")).distinct()
      val corpus = g.join(broadcast(benchIds), Seq("doc_id"), "left_anti")
      val shared = corpus.join(broadcast(benchGrams), Seq("gh"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      // rates in exact integer arithmetic (basis points, threshold as a
      // cross-multiplied integer compare): no double rounding, so both
      // engines agree bit-for-bit at any ratio
      // shared is (doc_id, count) for only the docs overlapping any
      // benchmark gram — typically far smaller than the corpus but not
      // provably broadcast-safe, so take the middle strategy (guide
      // §3.1): hash-build the shared side per partition instead of
      // sort-merging, which drops both sides' sorts from the plan
      // (plans/r17 td2 before: SortMergeJoin + 2 Sort → after:
      // ShuffledHashJoin BuildRight). Build-side rows are 16-byte
      // pairs, bounded per partition by AQE's advisory size.
      sizes.join(broadcast(benchIds), Seq("doc_id"), "left_anti")
        .join(shared.hint("shuffle_hash"), Seq("doc_id"), "left_outer")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .select(col("doc_id"), col("n_shared"), col("sz").as("n_grams"),
          expr("(10000 * n_shared) div sz").as("contam_bp"),
          (col("n_shared") * 5 >= col("sz")).cast("int").as("contaminated"))
    },
    Some("""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
           |b AS (SELECT doc_id,
           |        CAST(('0x' || substring(md5(text), 1, 2))::INTEGER AS INTEGER) AS bucket
           |      FROM documents),
           |bench AS (SELECT doc_id FROM b WHERE bucket >= 240),
           |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
           |       FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) ix),
           |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
           |bg AS (SELECT DISTINCT gram FROM sh JOIN bench USING (doc_id)),
           |corp AS (SELECT sh.doc_id, sh.gram FROM sh
           |         WHERE sh.doc_id NOT IN (SELECT doc_id FROM bench)),
           |shr AS (SELECT doc_id, count(*) AS n_shared FROM corp JOIN bg USING (gram)
           |        GROUP BY 1)
           |SELECT sz.doc_id, CAST(coalesce(shr.n_shared, 0) AS BIGINT) AS n_shared,
           |  sz.n AS n_grams,
           |  CAST((10000 * coalesce(shr.n_shared, 0)) // sz.n AS BIGINT) AS contam_bp,
           |  CAST(coalesce(shr.n_shared, 0) * 5 >= sz.n AS INTEGER) AS contaminated
           |FROM sz LEFT JOIN shr ON sz.doc_id = shr.doc_id
           |WHERE sz.doc_id NOT IN (SELECT doc_id FROM bench)""".stripMargin)
  )

  val PackChunks = 4

  /** td3 — chunk-level packing pipeline: the round-5 capstone chaining
    * three operators in ONE declarative plan, the prepare-for-training
    * tail of a corpus pipeline:
    *
    *   1. repeated-span removal (dd10) → per-doc surviving token count;
    *   2. context-window chunking (q45's formula) over the CLEANED
    *      length → per-doc chunk count (0 chunks for fully-boilerplate
    *      docs);
    *   3. sequence packing (q40's two-level prefix-sum decomposition,
    *      via Relational.runningSumBySource) in CHUNK units — PackChunks
    *      chunks per training sequence group, per source shard.
    *
    * Stages fuse: Catalyst plans the dd10 aggregation, the chunk
    * projection, and the pack assignment as one job with no
    * materialization between them. Scale properties are inherited from
    * the audited parts (dd10's segment-DF shuffle, q40's block-parallel
    * prefix sum). */
  val td3 = QueryDef(
    "td3_chunk_pack_pipeline",
    (s, d) => {
      import TextOps.{ChunkSize, ChunkStride}
      val cleaned = Dedup.dd10.fn(s, d).select(col("doc_id"), col("kept_tokens"))
      val chunked = cleaned
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
        .withColumn("n_chunks",
          when(col("kept_tokens") === 0, lit(0L))
            .otherwise(expr(
              s"1 + (greatest(kept_tokens - $ChunkSize, 0) + ${ChunkStride - 1}) div $ChunkStride")))
      Relational.runningSumBySource(chunked, col("n_chunks"))
        .withColumn("pack_id", expr(s"(cum - n_chunks) div $PackChunks"))
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chunks")).as("pack_chunks"),
          min(col("doc_id")).as("first_doc"))
    },
    Some(s"""WITH ${Dedup.SegOracleCtes},
            |clean AS (
            |  SELECT s.doc_id,
            |    sum(CASE WHEN c.seg_df < ${Dedup.SegDupDocs} THEN s.seg_toks ELSE 0 END) AS kept
            |  FROM segt s JOIN cnt c USING (seg) GROUP BY s.doc_id),
            |ch AS (
            |  SELECT d.source, cl.doc_id,
            |    CASE WHEN cl.kept = 0 THEN 0
            |         ELSE 1 + (greatest(cl.kept - ${TextOps.ChunkSize}, 0) + ${TextOps.ChunkStride - 1})
            |                  // ${TextOps.ChunkStride} END AS n_chunks
            |  FROM clean cl JOIN documents d USING (doc_id)),
            |c2 AS (
            |  SELECT source, doc_id, n_chunks,
            |    sum(n_chunks) OVER (PARTITION BY source ORDER BY doc_id
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            |  FROM ch)
            |SELECT source, CAST((cum - n_chunks) // $PackChunks AS BIGINT) AS pack_id,
            |  CAST(count(*) AS BIGINT) AS n_docs,
            |  CAST(sum(n_chunks) AS BIGINT) AS pack_chunks, min(doc_id) AS first_doc
            |FROM c2 GROUP BY source, pack_id""".stripMargin),
    doc = "chunk-pack pipeline: line-dedup -> chunk -> two-level pack, one fused plan"
  )

  val all: Seq[QueryDef] = Seq(td1, td2, td3)
}
