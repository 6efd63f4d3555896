package graft

import org.apache.spark.sql.functions._

/** Golden-count regression spec: every registered query runs at sf0.001
  * and must return exactly the row count captured from the
  * DuckDB-verified run (deterministic fixtures, seed=42). A count drift
  * means changed semantics — the full value-level check is the driver's
  * DuckDB differential (tools/check_oracle.py).
  */
class QueriesSpec extends SparkSpecBase {

  val goldenCounts: Map[String, Long] = Map(
    "dd1_dedup_exact" -> 500, "dd2_dedup_ngram_jaccard" -> 28,
    "dd3_dedup_minhash_lsh" -> 28, "dd4_dedup_embedding_cosine" -> 66,
    "dd5_dedup_simhash" -> 28, "mm1_media_decode" -> 500,
    "mm2_media_frames" -> 500, "mm3_media_resize" -> 500,
    "q01_filter_project" -> 3225,
    "q02_agg" -> 6, "q03_stream_table_join" -> 1500, "q04_join_chain" -> 5,
    "q04b_join_chain_bucketed" -> 5,
    "q05_anti_join" -> 3, "q05_semi_join" -> 147, "q06_broadcast_join" -> 10,
    "q07_tumbling_window" -> 951, "q07s_tumbling_stream" -> 951,
    "q09s_session_stream" -> 946, "dd3s_dedup_stream" -> 28,
    "q24s_fk_join_stream" -> 25, "sim4c_ann_ivfpq_served" -> 10,
    "sim2s_ann_serve_stream" -> 50,
    "sim2m_ann_maintained_stream" -> 50,
    "q08s_hopping_stream" -> 3800,
    "q07r_tumbling_restart" -> 951,
    "q08_hopping_window" -> 3800,
    "q08b_hopping_sliced" -> 11379,
    "q09_session_window" -> 946, "q09b_session_grace" -> 946,
    "q10_interval_join" -> 1, "q10s_interval_join_stream" -> 1,
    "q58_async_running_sum" -> 1000,
    "q37_window_backward_fetch" -> 45,
    "q38_stratified_sample" -> 5,
    "q11_late_data_grace" -> 951, "q12_ttl_default" -> 6,
    "q12s_kv_ttl_stream" -> 6,
    "q12p_kv_put_if_absent_stream" -> 15, "q12d_kv_tombstone_stream" -> 14,
    "q59_interactive_query" -> 15,
    "q13_ttl_row_level" -> 11, "q13b_ttl_from_key" -> 12, "q14_dedup_first" -> 75,
    "q15_range_prefix" -> 8, "q16_reverse_range" -> 20, "q17_topk" -> 10,
    "q18_setops" -> 253, "q19_window_functions" -> 1500,
    "q20_scalar_functions" -> 1000, "q21_checksum_udaf" -> 15,
    "q22_batch_by_key" -> 58, "q23_approx_count" -> 1, "q24_fk_join" -> 25,
    "q25_flatmap_explode" -> 31, "q26_branch_merge" -> 1000,
    "q27_outer_join" -> 318, "q28_rollup" -> 19, "dd6_dedup_clusters" -> 500,
    "q29_interval_left_join" -> 202, "q30_interval_full_join" -> 402,
    "q31_cube" -> 124, "q32_array_agg" -> 15, "td1_curation_pipeline" -> 472,
    "td2_decontamination" -> 464,
    "q33_pivot" -> 15, "q34_percentiles" -> 5, "q35_deterministic_split" -> 3,
    "q36_asof_join" -> 202,
    "sim1_ann_brute_topk" -> 50, "sim2_ann_ivf_topk" -> 50,
    "sim2b_ann_ivf_served" -> 50,
    "sim3_ann_ivf_kmeans" -> 10, "sim3b_ann_kmeans_served" -> 10,
    "sim4_ann_pq_topk" -> 10, "sim4b_ann_pq_served" -> 10,
    "tx1_token_stats" -> 500, "tx2_langid_ngram" -> 500,
    "tx3_quality_score" -> 500, "tx4_fingerprint" -> 500,
    "tx5_pii_redact" -> 500, "tx6_repetition" -> 500,
    "q39_corpus_mix" -> 20, "dd7_dedup_embedding_ivf" -> 53,
    "q40_sequence_packing" -> 142, "q41_cdc_snapshot_diff" -> 15,
    "tx7_bigram_novelty" -> 500, "dd8_dedup_substring" -> 500,
    "q42_incremental_agg" -> 15, "q43_approx_percentiles" -> 5,
    "q44_suppress_final" -> 950, "q45_doc_chunking" -> 705,
    "q46_heavy_hitters" -> 10, "dd9_semantic_dedup" -> 500,
    "q47_topk_per_group" -> 25, "q48_bloom_membership" -> 25,
    "q49_reservoir_sample" -> 40, "q50_inverted_index" -> 31,
    "q51_tfidf_keywords" -> 2500, "q52_bloom_pruned_join" -> 7,
    "q53_hll_cardinality" -> 1, "dd10_line_dedup" -> 500,
    "td3_chunk_pack_pipeline" -> 173, "q54_window_distinct_hll" -> 531,
    "q55_hll_set_ops" -> 1, "q56_window_heavy_hitters" -> 924,
    "q57_salted_skew_join" -> 15)

  test("registry covers every golden query and vice versa") {
    assert(SparkEntry.queries.keySet == goldenCounts.keySet)
  }

  for ((name, expected) <- goldenCounts.toSeq.sortBy(_._1)) {
    test(s"$name returns $expected rows at sf0.001") {
      assert(SparkEntry.queries(name)(spark, sfDir).count() == expected)
    }
  }

  test("entry() flagship smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL exists for every query — no ungraded driver rows") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  test("q23 approx_count_distinct lands within tolerance (ok flag = 1)") {
    val row = SparkEntry.queries("q23_approx_count")(spark, sfDir).collect().head
    assert(row.getAs[Int]("ok") == 1)
  }

  test("q17 top-k is ordered by revenue desc") {
    val rev = SparkEntry.queries("q17_topk")(spark, sfDir)
      .select(col("revenue")).collect().map(_.getDouble(0))
    assert(rev.sameElements(rev.sortBy(-_)))
  }
}
