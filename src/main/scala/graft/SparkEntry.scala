package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops.{Relational, Aggregates, Windows, ScalarFns, EventsOps, TextOps, TextAnalysis, VectorOps}
import graft.graph.GraphOps
import graft.bigclam.BigClam

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is a declared operator from SURVEY.md §2.b; every
  * key that is SQL-expressible also appears in `oracleSql` (graft.Oracles)
  * and is hash-checked against DuckDB by the driver. The five [no-oracle]
  * queries (sketches, sliding windows, BigCLAM) are invariant-tested in
  * src/test/scala instead.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.q_agg_hash(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scans / sources
    "q_scan_project" -> Relational.q_scan_project,
    "q_scan_edge_text" -> Relational.q_scan_edge_text,
    // filters
    "q_filter_pred" -> Relational.q_filter_pred,
    "q_filter_in_null" -> Relational.q_filter_in_null,
    // joins
    "q_join_inner_hash" -> Relational.q_join_inner_hash,
    "q_join_broadcast" -> Relational.q_join_broadcast,
    "q_join_left" -> Relational.q_join_left,
    "q_join_full" -> Relational.q_join_full,
    "q_join_semi" -> Relational.q_join_semi,
    "q_join_anti" -> Relational.q_join_anti,
    "q_join_cross" -> Relational.q_join_cross,
    "q_join_theta_range" -> Relational.q_join_theta_range,
    "q_join_asof" -> Relational.q_join_asof,
    // aggregations
    "q_agg_hash" -> Aggregates.q_agg_hash,
    "q_agg_distinct" -> Aggregates.q_agg_distinct,
    "q_agg_minmax_by" -> Aggregates.q_agg_minmax_by,
    "q_agg_rollup" -> Aggregates.q_agg_rollup,
    "q_agg_cube" -> Aggregates.q_agg_cube,
    "q_agg_grouping_sets" -> Aggregates.q_agg_grouping_sets,
    "q_agg_stats" -> Aggregates.q_agg_stats,
    "q_agg_corr" -> Aggregates.q_agg_corr,
    "q_agg_scalar" -> Aggregates.q_agg_scalar,
    "q_agg_array_sum" -> Aggregates.q_agg_array_sum,
    "q_agg_approx_distinct" -> Aggregates.q_agg_approx_distinct,
    "q_agg_salted" -> Aggregates.q_agg_salted,
    "q_join_salted" -> Aggregates.q_join_salted,
    "q_agg_percentiles" -> Aggregates.q_agg_percentiles,
    "q_pivot" -> Aggregates.q_pivot,
    "q_agg_histogram" -> Aggregates.q_agg_histogram,
    "q_agg_mode" -> Aggregates.q_agg_mode,
    // windows
    "q_win_rank" -> Windows.q_win_rank,
    "q_win_rownum" -> Windows.q_win_rownum,
    "q_win_running" -> Windows.q_win_running,
    "q_win_lag_lead" -> Windows.q_win_lag_lead,
    "q_win_ntile" -> Windows.q_win_ntile,
    "q_win_distribution" -> Windows.q_win_distribution,
    "q_win_range_frame" -> Windows.q_win_range_frame,
    // sort / top-k
    "q_sort_multi" -> Relational.q_sort_multi,
    "q_topk_per_group" -> Relational.q_topk_per_group,
    // set ops
    "q_set_union" -> Relational.q_set_union,
    "q_set_intersect" -> Relational.q_set_intersect,
    "q_set_except" -> Relational.q_set_except,
    // scalar functions
    "q_str_funcs" -> ScalarFns.q_str_funcs,
    "q_date_funcs" -> ScalarFns.q_date_funcs,
    "q_math_funcs" -> ScalarFns.q_math_funcs,
    "q_json_extract" -> ScalarFns.q_json_extract,
    "q_array_funcs" -> ScalarFns.q_array_funcs,
    "q_map_funcs" -> ScalarFns.q_map_funcs,
    // events (streaming semantics in batch)
    "q_events_tumbling" -> EventsOps.q_events_tumbling,
    "q_events_sliding" -> EventsOps.q_events_sliding,
    "q_events_sessionize" -> EventsOps.q_events_sessionize,
    "q_events_late_dedup" -> EventsOps.q_events_late_dedup,
    "q_events_funnel" -> EventsOps.q_events_funnel,
    "q_events_retention" -> EventsOps.q_events_retention,
    "q_events_streak" -> EventsOps.q_events_streak,
    "q_events_anomaly" -> EventsOps.q_events_anomaly,
    "q_events_transition" -> EventsOps.q_events_transition,
    "q_events_top_paths" -> EventsOps.q_events_top_paths,
    "q_events_attribution" -> EventsOps.q_events_attribution,
    "q_events_dau_wau" -> EventsOps.q_events_dau_wau,
    "q_events_ohlc" -> EventsOps.q_events_ohlc,
    // graph
    "q_graph_degree" -> GraphOps.q_graph_degree,
    "q_graph_neighbors" -> GraphOps.q_graph_neighbors,
    "q_graph_common_neighbors" -> GraphOps.q_graph_common_neighbors,
    "q_graph_conductance" -> GraphOps.q_graph_conductance,
    "q_graph_triangle_count" -> GraphOps.q_graph_triangle_count,
    "q_graph_seed_rank" -> GraphOps.q_graph_seed_rank,
    "q_graph_cc" -> GraphOps.q_graph_cc,
    "q_graph_pagerank" -> GraphOps.q_graph_pagerank,
    "q_graph_ppr" -> GraphOps.q_graph_ppr,
    "q_graph_lpa" -> GraphOps.q_graph_lpa,
    "q_graph_link_predict" -> GraphOps.q_graph_link_predict,
    "q_graph_kcore" -> GraphOps.q_graph_kcore,
    "q_graph_bfs" -> GraphOps.q_graph_bfs,
    "q_graph_degree_dist" -> GraphOps.q_graph_degree_dist,
    "q_graph_clustering_coeff" -> GraphOps.q_graph_clustering_coeff,
    "q_graph_assortativity" -> GraphOps.q_graph_assortativity,
    "q_graph_modularity" -> GraphOps.q_graph_modularity,
    // BigCLAM
    "bigclam_fit_smoke" -> BigClam.bigclam_fit_smoke,
    "bigclam_fit_sparse_smoke" -> BigClam.bigclam_fit_sparse_smoke,
    "bigclam_communities" -> BigClam.bigclam_communities,
    "bigclam_community_members" -> BigClam.bigclam_community_members,
    "bigclam_select_k_smoke" -> BigClam.bigclam_select_k_smoke,
    "bigclam_eval_smoke" -> BigClam.bigclam_eval_smoke,
    "bigclam_recovery_smoke" -> BigClam.bigclam_recovery_smoke,
    "bigclam_recovery_overlap_smoke" -> BigClam.bigclam_recovery_overlap_smoke,
    "bigclam_modularity_smoke" -> BigClam.bigclam_modularity_smoke,
    // LLM-pipeline: text
    "q_text_tokenize" -> TextOps.q_text_tokenize,
    "q_text_ngram_freq" -> TextOps.q_text_ngram_freq,
    "q_text_stats" -> TextOps.q_text_stats,
    "q_dedup_exact" -> TextOps.q_dedup_exact,
    "q_dedup_shingle" -> TextOps.q_dedup_shingle,
    "q_dedup_jaccard" -> TextOps.q_dedup_jaccard,
    "q_dedup_incremental" -> TextOps.q_dedup_incremental,
    "q_corpus_stats" -> TextAnalysis.q_corpus_stats,
    "q_dedup_containment" -> TextOps.q_dedup_containment,
    "q_dedup_lines" -> TextOps.q_dedup_lines,
    "q_dedup_prefix" -> TextOps.q_dedup_prefix,
    "q_text_contamination" -> TextOps.q_text_contamination,
    "q_text_pack" -> TextOps.q_text_pack,
    "q_dedup_simhash" -> TextOps.q_dedup_simhash,
    "q_minhash_lsh" -> TextOps.q_minhash_lsh,
    "q_dedup_cluster" -> TextOps.q_dedup_cluster,
    "q_dedup_lsh_cluster" -> TextOps.q_dedup_lsh_cluster,
    "q_dedup_minhash_audit" -> TextOps.q_dedup_minhash_audit,
    // LLM-pipeline: text analysis
    "q_text_quality" -> TextAnalysis.q_text_quality,
    "q_text_quality_gopher" -> TextAnalysis.q_text_quality_gopher,
    "q_sample_quota" -> TextAnalysis.q_sample_quota,
    "q_sample_mixture" -> TextAnalysis.q_sample_mixture,
    "q_text_langid" -> TextAnalysis.q_text_langid,
    "q_text_tfidf" -> TextAnalysis.q_text_tfidf,
    "q_text_lm_score" -> TextAnalysis.q_text_lm_score,
    "q_text_chunk" -> TextAnalysis.q_text_chunk,
    "q_text_fingerprint" -> TextAnalysis.q_text_fingerprint,
    "q_text_pii_mask" -> TextAnalysis.q_text_pii_mask,
    "q_sample_stratified" -> TextAnalysis.q_sample_stratified,
    "q_text_token_bpe" -> TextAnalysis.q_text_token_bpe,
    // LLM-pipeline: vectors
    "q_sim_cosine_topk" -> VectorOps.q_sim_cosine_topk,
    "q_sim_neardup_cosine" -> VectorOps.q_sim_neardup_cosine,
    "q_sim_ann_lsh" -> VectorOps.q_sim_ann_lsh,
    "q_sim_ann_ivf" -> VectorOps.q_sim_ann_ivf,
    "q_cluster_kmeans" -> VectorOps.q_cluster_kmeans,
    "q_embed_quantize" -> VectorOps.q_embed_quantize,
    "q_dedup_semantic" -> VectorOps.q_dedup_semantic,
    "q_dedup_semantic_bucketed" -> VectorOps.q_dedup_semantic_bucketed,
    "q_sim_ann_recall" -> VectorOps.q_sim_ann_recall,
    "q_embed_pq" -> VectorOps.q_embed_pq,
    "q_sim_ann_ivfpq" -> VectorOps.q_sim_ann_ivfpq,
    // LLM-pipeline: multimodal (binary media + stub decode)
    "q_multimodal_dedup" -> graft.multimodal.MultimodalOps.q_multimodal_dedup,
    "q_multimodal_features" -> graft.multimodal.MultimodalOps.q_multimodal_features,
    "q_multimodal_audio" -> graft.multimodal.MultimodalOps.q_multimodal_audio,
    "q_multimodal_image" -> graft.multimodal.MultimodalOps.q_multimodal_image,
    "q_multimodal_video" -> graft.multimodal.MultimodalOps.q_multimodal_video,
    "q_multimodal_frame_dedup" -> graft.multimodal.MultimodalOps.q_multimodal_frame_dedup,
    "q_multimodal_frame_dedup_exists" -> graft.multimodal.MultimodalOps.q_multimodal_frame_dedup_exists
  )

  /** DuckDB oracle SQL per oracle-checkable query (graft.Oracles). */
  def oracleSql: Map[String, String] = Oracles.sql
}
