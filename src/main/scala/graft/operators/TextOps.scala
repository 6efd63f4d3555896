package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.RollingHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text analysis for training-data pipelines over `documents`:
  * token/char statistics, n-gram classification (language-ID-shaped
  * scoring over the fixture's synthetic vocabulary), quality scoring,
  * and rolling-hash fingerprinting.
  *
  * Everything is a per-row projection — embarrassingly parallel, no
  * shuffle, stays inside whole-stage codegen (tx4's fingerprint is a
  * custom Catalyst expression with doGenCode for exactly that reason).
  */
object TextOps {

  /** tx1 — token counting: whitespace tokens, distinct vocab, average
    * token length, and a BPE-ish size estimate (≈ chars/4, the common
    * tokens-per-byte heuristic). */
  val tx1 = QueryDef(
    "tx1_token_stats",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("n_alpha", length(regexp_replace(col("text"), " ", "")))
        .select(
          col("doc_id"),
          length(col("text")).cast("int").as("len_chars"),
          (length(col("text")) - col("n_alpha") + 1).cast("int").as("n_tokens"),
          size(array_distinct(col("ws"))).as("n_distinct"),
          round(col("n_alpha") / (length(col("text")) - col("n_alpha") + 1), 4).as("avg_token_len"),
          ceil(length(col("text")) / 4.0).cast("long").as("bpe_est")),
    Some("""SELECT doc_id,
           |  CAST(length(text) AS INTEGER) AS len_chars,
           |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INTEGER) AS n_tokens,
           |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
           |  round(length(replace(text, ' ', '')) * 1.0 /
           |        (length(text) - length(replace(text, ' ', '')) + 1), 4) AS avg_token_len,
           |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
           |FROM documents""".stripMargin)
  )

  /** Marker-word count: occurrences of `w` in the split text. */
  def cnt(w: String): String = s"size(filter(ws, x -> x = '$w'))"
  def cntSql(w: String): String = s"len(list_filter(ws, x -> x = '$w'))"

  val classes: Seq[(String, Seq[String])] = Seq(
    "cls_join"   -> Seq("join", "merge", "hash"),
    "cls_stream" -> Seq("window", "stream", "batch"),
    "cls_table"  -> Seq("table", "row", "column"),
    "cls_scan"   -> Seq("filter", "scan", "sort"))

  /** tx2 — n-gram-frequency classifier (the language-ID heuristic shape:
    * per-class marker counts → argmax with a deterministic tiebreak).
    * The fixture vocabulary is synthetic, so classes are topic buckets
    * rather than natural languages; the operator is the same. */
  val tx2 = QueryDef(
    "tx2_langid_ngram",
    (s, d) => {
      var df = Tables.documents(s, d).withColumn("ws", split(col("text"), " "))
      for ((name, words) <- classes)
        df = df.withColumn(name, expr(words.map(cnt).mkString(" + ")))
      val Seq(a, b, c, dd) = classes.map(_._1)
      df.select(
        col("doc_id"),
        col(a), col(b), col(c), col(dd),
        expr(s"""CASE WHEN $a >= $b AND $a >= $c AND $a >= $dd THEN '$a'
                |     WHEN $b >= $c AND $b >= $dd THEN '$b'
                |     WHEN $c >= $dd THEN '$c' ELSE '$dd' END""".stripMargin).as("predicted"))
    },
    Some {
      val cols = classes.map { case (name, words) =>
        s"  ${words.map(cntSql).mkString(" + ")} AS $name"
      }.mkString(",\n")
      val Seq(a, b, c, dd) = classes.map(_._1)
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |scored AS (SELECT doc_id,\n$cols\nFROM w)
         |SELECT doc_id, $a, $b, $c, $dd,
         |  CASE WHEN $a >= $b AND $a >= $c AND $a >= $dd THEN '$a'
         |       WHEN $b >= $c AND $b >= $dd THEN '$b'
         |       WHEN $c >= $dd THEN '$c' ELSE '$dd' END AS predicted
         |FROM scored""".stripMargin
    }
  )

  /** tx3 — quality scoring: length saturation, vocabulary richness, and
    * stopword ratio combined into one [0,1] score (the usual heuristic
    * pre-filter before expensive model-based quality scoring). */
  val tx3 = QueryDef(
    "tx3_quality_score",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("n_tok", size(col("ws")))
        .withColumn("n_dis", size(array_distinct(col("ws"))))
        .withColumn("n_stop", expr(cnt("the")) + expr(cnt("a")))
        .select(
          col("doc_id"),
          round(least(col("n_tok") / 50.0, lit(1.0)), 4).as("len_score"),
          round(col("n_dis") / col("n_tok"), 4).as("richness"),
          round(col("n_stop") / col("n_tok"), 4).as("stop_ratio"),
          round(least(col("n_tok") / 50.0, lit(1.0)) * 0.4 +
            (col("n_dis") / col("n_tok")) * 0.4 +
            (lit(1.0) - col("n_stop") / col("n_tok")) * 0.2, 4).as("quality")),
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |t AS (SELECT doc_id, len(ws) AS n_tok,
           |        len(list_distinct(ws)) AS n_dis,
           |        len(list_filter(ws, x -> x = 'the')) +
           |        len(list_filter(ws, x -> x = 'a')) AS n_stop
           |      FROM w)
           |SELECT doc_id,
           |  round(least(n_tok / 50.0, 1.0), 4) AS len_score,
           |  round(n_dis * 1.0 / n_tok, 4) AS richness,
           |  round(n_stop * 1.0 / n_tok, 4) AS stop_ratio,
           |  round(least(n_tok / 50.0, 1.0) * 0.4 + (n_dis * 1.0 / n_tok) * 0.4 +
           |        (1.0 - n_stop * 1.0 / n_tok) * 0.2, 4) AS quality
           |FROM t""".stripMargin)
  )

  /** tx4 — document fingerprint: 31-ary rolling hash mod (2³¹−1) over
    * the text, as a custom codegen'd Catalyst expression, plus md5 for a
    * portable exact fingerprint. */
  val tx4 = QueryDef(
    "tx4_fingerprint",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        RollingHash.column(col("text")).as("rhash"),
        md5(col("text")).as("md5_hex")),
    Some("""SELECT doc_id,
           |  list_reduce(
           |    list_prepend(CAST(0 AS BIGINT),
           |      list_transform(string_split_regex(text, ''), c -> unicode(c))),
           |    (a, b) -> (a * 31 + b) % 2147483647) AS rhash,
           |  md5(text) AS md5_hex
           |FROM documents""".stripMargin)
  )

  /** The PII pattern set (Java and RE2 agree on this subset): emails,
    * NANP-style phone numbers, dotted-quad IPs. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** tx5 — PII detection + redaction. The fixture corpus carries no PII
    * (30-word synthetic vocabulary), so the query first plants
    * deterministic PII derived from doc_id — the SAME expression in both
    * engines, so the oracle still checks the regex scan/redact, not the
    * planting. Counts come from the regex engine, redaction replaces
    * every match with a fixed token; clean_len proves the replacement
    * ran. Per-row projection: no shuffle, scales linearly. */
  val tx5 = QueryDef(
    "tx5_pii_redact",
    (s, d) => {
      val planted = concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 1,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 2,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") * 7) % 256).cast("string")))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .withColumn("aug", planted)
        .withColumn("clean",
          regexp_replace(regexp_replace(regexp_replace(col("aug"),
            EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>"))
        .select(
          col("doc_id"),
          regexp_count(col("aug"), lit(EmailRe)).cast("int").as("n_emails"),
          regexp_count(col("aug"), lit(PhoneRe)).cast("int").as("n_phones"),
          regexp_count(col("aug"), lit(IpRe)).cast("int").as("n_ips"),
          length(col("clean")).cast("int").as("clean_len"))
    },
    Some("""WITH a AS (SELECT doc_id,
           |    text ||
           |    CASE WHEN doc_id % 3 = 0
           |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
           |         ELSE '' END ||
           |    CASE WHEN doc_id % 4 = 1
           |         THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
           |              '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           |         ELSE '' END ||
           |    CASE WHEN doc_id % 5 = 2
           |         THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
           |              '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
           |         ELSE '' END AS aug
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
           |  CAST(len(regexp_extract_all(aug, '\b\d{3}-\d{3}-\d{4}\b')) AS INTEGER) AS n_phones,
           |  CAST(len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
           |  CAST(length(
           |    regexp_replace(
           |      regexp_replace(
           |        regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           |        '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
           |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS INTEGER) AS clean_len
           |FROM a""".stripMargin)
  )

  /** tx6 — repetition signals (the Gopher-rule shape): most-frequent-word
    * count and duplicate-bigram count per document, the filters that
    * catch boilerplate and degenerate generations. Integer numerators +
    * denominators (never ratios) so the cross-engine compare is exact;
    * computed in one typed map per row — per-doc hash counting beats a
    * per-doc explode+groupBy shuffle and stays embarrassingly parallel. */
  val tx6 = QueryDef(
    "tx6_repetition",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id").as[Long], col("text").as[String])
        .map { case (id, t) =>
          val ws = t.split(" ", -1)
          val counts = scala.collection.mutable.HashMap.empty[String, Int]
          ws.foreach(w => counts.update(w, counts.getOrElse(w, 0) + 1))
          val bigrams = scala.collection.mutable.HashSet.empty[String]
          var i = 0
          while (i < ws.length - 1) { bigrams += (ws(i) + " " + ws(i + 1)); i += 1 }
          val nBigrams = math.max(ws.length - 1, 0)
          (id, ws.length.toLong, counts.size.toLong, counts.values.max.toLong,
            nBigrams.toLong, (nBigrams - bigrams.size).toLong)
        }
        .toDF("doc_id", "n_words", "n_distinct", "top_word_n", "n_bigrams", "dup_bigram_n")
    },
    Some("""WITH w AS (SELECT doc_id,
           |    unnest(string_split(text, ' ')) AS word,
           |    generate_subscripts(string_split(text, ' '), 1) AS pos
           |  FROM documents),
           |wc AS (SELECT doc_id, max(c) AS top_word_n FROM (
           |    SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2)
           |  GROUP BY 1),
           |bg AS (SELECT doc_id,
           |    CAST(count(*) AS BIGINT) AS n_bigrams,
           |    CAST(count(*) - count(DISTINCT bigram) AS BIGINT) AS dup_bigram_n
           |  FROM (
           |    SELECT doc_id, pos,
           |      word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
           |    FROM w QUALIFY bigram IS NOT NULL)
           |  GROUP BY 1)
           |SELECT d.doc_id,
           |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
           |  CAST(len(list_distinct(string_split(d.text, ' '))) AS BIGINT) AS n_distinct,
           |  CAST(wc.top_word_n AS BIGINT) AS top_word_n,
           |  coalesce(bg.n_bigrams, 0) AS n_bigrams,
           |  coalesce(bg.dup_bigram_n, 0) AS dup_bigram_n
           |FROM documents d
           |JOIN wc ON d.doc_id = wc.doc_id
           |LEFT JOIN bg ON d.doc_id = bg.doc_id""".stripMargin)
  )

  /** tx7 — corpus bigram-LM novelty scoring (the CCNet/KenLM-shaped
    * quality signal): count every bigram occurrence across the corpus,
    * then score each document by the mean corpus frequency of its
    * bigrams — low mean frequency = novel/rare text, high = boilerplate.
    * The score is the integer `(1000 × Σ freq) div n_bigrams` so the
    * cross-engine compare is exact (no float log-probs). Scale: one
    * count shuffle on the bigram key + one join back — the "LM" is the
    * corpus itself, no model table; at 100 TB the frequency table is
    * the corpus-wide aggregation a real LM-filter pipeline builds once
    * and reuses. */
  val tx7 = QueryDef(
    "tx7_bigram_novelty",
    (s, d) => {
      import s.implicits._
      val bi = Tables.documents(s, d)
        .select(col("doc_id").as[Long], col("text").as[String])
        .flatMap { case (id, t) =>
          val ws = t.split(" ", -1)
          Iterator.range(0, ws.length - 1).map(i => (id, ws(i) + " " + ws(i + 1)))
        }
        .toDF("doc_id", "bigram")
      val freq = bi.groupBy(col("bigram")).agg(count(lit(1)).as("f"))
      bi.join(freq, Seq("bigram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("f")).as("fsum"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("(1000 * fsum) div n_bigrams").as("mean_freq_x1000"))
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |b AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
           |      FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) ix),
           |f AS (SELECT bigram, count(*) AS f FROM b GROUP BY 1)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |  CAST((1000 * sum(f.f)) // count(*) AS BIGINT) AS mean_freq_x1000
           |FROM b JOIN f USING (bigram) GROUP BY doc_id""".stripMargin),
    doc = "bigram-LM novelty: mean corpus bigram frequency per doc, integer-exact"
  )

  val ChunkSize = 64
  val ChunkStride = 48

  /** q45 — document chunking (the context-window splitting step of a
    * training pipeline, the complement of q40's packing): each document's
    * token sequence is cut into windows of ChunkSize tokens advancing by
    * ChunkStride, so consecutive chunks overlap by ChunkSize−ChunkStride
    * = 16 tokens (boundary context is preserved across the cut). A doc
    * with ≤ ChunkSize tokens is one chunk; otherwise
    * 1 + ⌈(n − ChunkSize) / ChunkStride⌉ chunks, the last one short.
    * Emits one row per chunk (doc_id, chunk_idx, start_tok, chunk_len).
    * Scale: pure per-row arithmetic + a sequence/posexplode generator —
    * no shuffle, stays in whole-stage codegen, output is a constant
    * ~C/S × input rows. */
  val q45 = QueryDef(
    "q45_doc_chunking",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
        .withColumn("n_chunks",
          expr(s"1 + (greatest(n_tokens - $ChunkSize, 0) + ${ChunkStride - 1}) div $ChunkStride"))
        .select(col("doc_id"), col("n_tokens"),
          posexplode(expr("sequence(0L, n_chunks - 1)")))
        .select(col("doc_id"),
          col("pos").cast("int").as("chunk_idx"),
          (col("col") * ChunkStride).cast("int").as("start_tok"),
          least(lit(ChunkSize), col("n_tokens") - col("col") * ChunkStride)
            .cast("int").as("chunk_len")),
    Some(s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
            |c AS (SELECT doc_id, n_tokens,
            |        1 + (greatest(n_tokens - $ChunkSize, 0) + ${ChunkStride - 1}) // $ChunkStride AS n_chunks
            |      FROM t)
            |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
            |  CAST(i * $ChunkStride AS INTEGER) AS start_tok,
            |  CAST(least($ChunkSize, n_tokens - i * $ChunkStride) AS INTEGER) AS chunk_len
            |FROM c, LATERAL (SELECT unnest(range(0, n_chunks)) AS i) ix""".stripMargin),
    doc = "context-window chunking: overlapping token windows (size 64, stride 48) per document"
  )

  val PostingHead = 5

  /** q50 — inverted-index / IDF dictionary export (the search-index and
    * IDF-table build step of a corpus pipeline). One row per vocabulary
    * term: document frequency, collection frequency, and the head of
    * the posting list (first PostingHead doc_ids in doc_id order).
    * Scale: the word-count shape — (term, doc) partial counts map-side,
    * then one shuffle per grouping; the posting head uses the
    * bounded-heap TopKAgg (score = −doc_id ⇒ k smallest), so even a
    * stopword's "posting list" ships PostingHead ids per partition
    * instead of the full millions-long list. The full-postings variant
    * is Sharding.writeSorted territory (sorted export), deliberately
    * not an unbounded array column. */
  val q50 = QueryDef(
    "q50_inverted_index",
    (s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
          graft.functions.SketchAggs.topk(
            -col("doc_id").cast("double"), col("doc_id"), PostingHead).as("top"))
        .select(col("term"), col("df"), col("cf"),
          array_join(expr("transform(top, p -> cast(p.id as string))"), ",").as("posting_head"))
    },
    Some(s"""WITH tok AS (
            |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
            |tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
            |       WHERE term <> '' GROUP BY 1, 2)
            |SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
            |  array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, $PostingHead), ',')
            |    AS posting_head
            |FROM tf GROUP BY term""".stripMargin),
    doc = "inverted-index export: df/cf per term + bounded-heap posting head, word-count shape"
  )

  val KwK = 5

  /** q51 — tf-idf keyword extraction: the top KwK terms per document
    * ranked by (tf DESC, df ASC, term ASC) — highest-frequency rarest
    * terms first, the integer-exact tf-idf ordering (score floats never
    * cross the engine boundary, so the oracle matches bit-for-bit; for
    * equal tf, lower df ⇔ higher idf ⇔ higher tf·idf). The per-term df
    * table is small (vocabulary-sized) and broadcasts; the per-doc
    * ranking window partitions on doc_id — groups are bounded by
    * document length, so the sort is per-doc-local and skew-free at any
    * corpus size. */
  val q51 = QueryDef(
    "q51_tfidf_keywords",
    (s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      tf.join(broadcast(df), Seq("term"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= KwK)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
    },
    Some(s"""WITH tok AS (
            |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
            |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
            |       WHERE term <> '' GROUP BY 1, 2),
            |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
            |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
            |        row_number() OVER (PARTITION BY tf.doc_id
            |          ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
            |      FROM tf JOIN df USING (term))
            |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, df
            |FROM r WHERE rank <= $KwK""".stripMargin),
    doc = "tf-idf keyword extraction: integer-exact (tf desc, df asc) per-doc ranking"
  )

  val all: Seq[QueryDef] = Seq(tx1, tx2, tx3, tx4, tx5, tx6, tx7, q45, q50, q51)
}
