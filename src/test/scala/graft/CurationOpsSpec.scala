package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-3 curation operators (value-level
  * grading is the DuckDB differential; these pin the properties the
  * hashes alone don't explain). */
class CurationOpsSpec extends SparkSpecBase {

  test("tx5: planted PII is found and fully redacted") {
    val rows = SparkEntry.queries("tx5_pii_redact")(spark, sfDir).collect()
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      assert((r.getAs[Int]("n_emails") >= 1) == (id % 3 == 0),
        s"doc $id email count ${r.getAs[Int]("n_emails")}")
      assert((r.getAs[Int]("n_phones") >= 1) == (id % 4 == 1))
      assert((r.getAs[Int]("n_ips") >= 1) == (id % 5 == 2))
    }
    // redaction is total: clean_len reflects every match replaced, and
    // rows with no planted PII keep their original length + nothing else
    val joined = Tables.documents(spark, sfDir).select(col("doc_id"), length(col("text")).as("len0"))
      .join(SparkEntry.queries("tx5_pii_redact")(spark, sfDir), "doc_id")
      .collect()
    for (r <- joined) {
      val id = r.getAs[Long]("doc_id")
      if (id % 3 != 0 && id % 4 != 1 && id % 5 != 2)
        assert(r.getAs[Int]("clean_len") == r.getAs[Int]("len0"),
          s"doc $id: unexpected rewrite of PII-free text")
      else
        assert(r.getAs[Int]("clean_len") > r.getAs[Int]("len0"),
          s"doc $id: redaction tokens missing")
    }
  }

  test("tx6: repetition counters are internally consistent") {
    val rows = SparkEntry.queries("tx6_repetition")(spark, sfDir).collect()
    for (r <- rows) {
      val nWords = r.getAs[Long]("n_words")
      val nDistinct = r.getAs[Long]("n_distinct")
      val topN = r.getAs[Long]("top_word_n")
      val nBg = r.getAs[Long]("n_bigrams")
      val dupBg = r.getAs[Long]("dup_bigram_n")
      assert(nDistinct <= nWords && topN >= 1 && topN <= nWords)
      assert(nBg == math.max(nWords - 1, 0) && dupBg >= 0 && dupBg <= nBg)
      // a 30-word vocabulary forces heavy repetition on long docs
      if (nWords >= 60) assert(topN > 1, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("q39: keep rate decreases with source index, src0 keeps everything") {
    val rows = SparkEntry.queries("q39_corpus_mix")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source").drop(3).toInt,
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept")))
      .sortBy(_._1)
    assert(rows.length == 20)
    val (idx0, n0, k0) = rows.head
    assert(idx0 == 0 && k0 == n0, "src0 must keep all docs (rate 1.0)")
    for ((i, n, k) <- rows) assert(k <= n)
    // aggregate keep fraction of the top half of sources exceeds the
    // bottom half (md5 buckets are uniform; rates are 1.0 … 0.05)
    val (hi, lo) = rows.partition(_._1 < 10)
    val hiRate = hi.map(_._3).sum.toDouble / hi.map(_._2).sum
    val loRate = lo.map(_._3).sum.toDouble / lo.map(_._2).sum
    assert(hiRate > loRate)
  }

  test("dd7: IVF-cell pairs are a subset of dd4's exact pairs, recall is substantial") {
    val exact = SparkEntry.queries("dd4_dedup_embedding_cosine")(spark, sfDir)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dd7_dedup_embedding_ivf")(spark, sfDir)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-verified pairs: ${lsh.diff(exact).take(5)}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall (${lsh.size}/${exact.size})")
    // high-similarity pairs (cos >= 0.8) must be mostly recalled — the
    // LSH operating point near-dup dedup cares about
    val hi = SparkEntry.queries("dd4_dedup_embedding_cosine")(spark, sfDir)
      .filter(col("cos_sim") >= 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (hi.nonEmpty) {
      val hiRecall = hi.count(lsh.contains).toDouble / hi.size
      assert(hiRecall >= 0.8, s"high-sim recall $hiRecall")
    }
  }

  test("dd8: substring overlap matches an independent in-memory recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val wins = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      id -> (if (ws.length < 8) Array.empty[String] else ws.sliding(8).map(_.mkString(" ")).toArray)
    }.toMap
    val shared = wins.toSeq.flatMap { case (id, w) => w.distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expected = wins.collect { case (id, w) if w.nonEmpty =>
      val nShared = w.count(shared)
      id -> ((w.length.toLong, nShared.toLong, 10000L * nShared / w.length))
    }
    val got = SparkEntry.queries("dd8_dedup_substring")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("q40: packing conserves tokens and docs per source, pack ids start at 0") {
    val byDoc = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val wantTokens = byDoc.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wantDocs = byDoc.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val packs = SparkEntry.queries("q40_sequence_packing")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val gotTokens = packs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val gotDocs = packs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(gotTokens == wantTokens && gotDocs == wantDocs)
    assert(packs.groupBy(_._1).values.forall(_.map(_._2).min == 0L))
  }

  test("q40: two-level prefix-sum decomposition == naive per-source window, more tasks than sources") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Relational.{PackBudget, PackBlock}
    val naive = {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(spark, sfDir)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tokens"))
        .withColumn("cum", sum(col("tokens")).over(w))
        .withColumn("pack_id", expr(s"(cum - tokens) div $PackBudget"))
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("pack_tokens"),
          min(col("doc_id")).as("first_doc"))
    }
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(SparkEntry.queries("q40_sequence_packing")(spark, sfDir)
      .collect().map(key).sortBy(t => (t._1, t._2)).toSeq ==
      naive.collect().map(key).sortBy(t => (t._1, t._2)).toSeq)
    // the decomposition's parallelism units: (source, doc_id-range block)
    // groups must outnumber the sources the naive plan is limited to
    val units = Tables.documents(spark, sfDir)
      .select(col("source"), expr(s"doc_id div $PackBlock").as("blk"))
      .distinct()
    assert(units.count() > units.select("source").distinct().count())
  }
}
