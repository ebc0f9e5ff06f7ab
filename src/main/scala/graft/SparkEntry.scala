package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage catalog (one entry per implemented
  * operator from SURVEY.md §2 + the LLM-pipeline ops); `oracleSql` carries a
  * DuckDB-equivalent SQL for every query whose semantics are deterministic
  * and SQL-expressible (the driver hash-compares both results at sf0.01).
  * Queries without an oracle get a weaker rows-only check (approximate /
  * hash-seeded / stub-backed operators).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // element-wise
    "q_map_project"     -> Queries.qMapProject _,
    "q_filter"          -> Queries.qFilter _,
    "q_flatmap_wc"      -> Queries.qFlatMapWordcount _,
    "q_partition"       -> Queries.qPartition _,
    "q_regex_extract"   -> Queries.qRegexExtract _,
    "q_tostring_kv"     -> Queries.qToStringKv _,
    "q_json_parse"      -> Queries.qJsonParse _,
    "q_with_keys"       -> Queries.qWithKeys _,
    // aggregations
    "q1_agg"            -> Queries.q1Agg _,
    "q_count_global"    -> Queries.qCountGlobal _,
    "q_count_per_elem"  -> Queries.qCountPerElement _,
    "q_minmax_per_key"  -> Queries.qMinMaxPerKey _,
    "q_top_per_key"     -> Queries.qTopPerKey _,
    "q_latest_per_key"  -> Queries.qLatestPerKey _,
    "q_distinct"        -> Queries.qDistinct _,
    "q_distinct_rep"    -> Queries.qDistinctRep _,
    "q_mean_per_key"    -> Queries.qMeanPerKey _,
    "q_quantile_exact"  -> Queries.qQuantileExact _,
    "q_approx_quant"    -> Queries.qApproxQuantiles _,
    "q_count_distinct"  -> Queries.qCountDistinct _,
    "q_approx_unique"   -> Queries.qApproxUnique _,
    "q_kmv_unique"      -> Queries.qKmvUnique _,
    "q_cms_freq"        -> Queries.qCmsFreq _,
    "q_mp_quantiles"    -> Queries.qMpQuantiles _,
    "q_sample_residue"  -> Queries.qSampleResidue _,
    "q_sample_any"      -> Queries.qSampleAny _,
    "q_gbk_list"        -> Queries.qGbkList _,
    "q_group_batches"   -> Queries.qGroupIntoBatches _,
    "q_sort_values"     -> Queries.qSortValues _,
    "q_argmax"          -> Queries.qArgMax _,
    "q_typed_meanmax"   -> Queries.qTypedMeanMax _,
    "q_reservoir"       -> Queries.qReservoir _,
    "q_stateful_batches" -> Queries.qStatefulBatches _,
    // joins
    "q_join_inner"      -> Queries.qJoinInner _,
    "q_join_left"       -> Queries.qJoinLeft _,
    "q_join_full"       -> Queries.qJoinFull _,
    "q_cogbk"           -> Queries.qCoGbk _,
    "q_join_semi"       -> Queries.qJoinSemi _,
    "q_join_anti"       -> Queries.qJoinAnti _,
    "q_broadcast_join"  -> Queries.qBroadcastJoin _,
    "q_bloom_semi"      -> Queries.qBloomSemi _,
    "q_asof_join"       -> Queries.qAsofJoin _,
    "q_range_join"      -> Queries.qRangeJoin _,
    "q_interval_join"   -> Queries.qIntervalJoin _,
    "q_zorder_key"      -> Queries.qZorderKey _,
    "q_flatten"         -> Queries.qFlatten _,
    "q_intersect"       -> Queries.qIntersect _,
    "q_except"          -> Queries.qExcept _,
    // windowing
    "q_window_fixed"    -> Queries.qWindowFixed _,
    "q_window_sliding"  -> Queries.qWindowSliding _,
    "q_window_session"  -> Queries.qWindowSession _,
    "q_sessionize"      -> Queries.qSessionize _,
    "q_gap_fill"        -> Queries.qGapFill _,
    "q_rolling_z"       -> Queries.qRollingZ _,
    "q_ewma"            -> Queries.qEwma _,
    "q_pivot"           -> Queries.qPivot _,
    "q_percentiles"     -> Queries.qPercentiles _,
    "q_data_checks"     -> Queries.qDataChecks _,
    "q_profile"         -> Queries.qProfile _,
    "q_drift_psi"       -> Queries.qDriftPsi _,
    "q_word_extract"    -> Queries.qWordExtract _,
    "q_funnel"          -> Queries.qFunnel _,
    "q_window_calendar" -> Queries.qWindowCalendar _,
    "q_window_weekly"   -> Queries.qWindowWeekly _,
    "q_weekly_team_score" -> Queries.qWeeklyTeamScore _,
    "q_top_sessions"    -> Queries.qTopSessions _,
    "q_tfidf"           -> Queries.qTfIdf _,
    "q_autocomplete"    -> Queries.qAutoComplete _,
    "q_traffic_max_lane" -> Queries.qTrafficMaxLane _,
    "q_traffic_routes"  -> Queries.qTrafficRoutes _,
    "q_windowed_wc"     -> Queries.qWindowedWc _,
    "q_tornadoes"       -> Queries.qTornadoes _,
    "q_large_word_plays" -> Queries.qLargeWordPlays _,
    "q_distinct_lines"  -> Queries.qDistinctLines _,
    "q_filter_below_mean" -> Queries.qFilterBelowMean _,
    "q_join_examples"   -> Queries.qJoinExamples _,
    "q_max_per_day"     -> Queries.qMaxPerDay _,
    // LLM-pipeline ops
    "q_dedup_exact"     -> Queries.qDedupExact _,
    "q_dedup_incr"      -> Queries.qDedupIncremental _,
    "q_dedup_minhash"   -> Queries.qDedupMinhash _,
    "q_simhash"         -> Queries.qSimHash _,
    "q_ngram_jaccard"   -> Queries.qNgramJaccard _,
    "q_dedup_clusters"  -> Queries.qDedupClusters _,
    "q_span_dedup"      -> Queries.qSpanDedup _,
    "q_bm25"            -> Queries.qBm25 _,
    "q_bm25_batch"      -> Queries.qBm25Batch _,
    "q_hybrid_rrf"      -> Queries.qHybridRrf _,
    "q_embed_topk"      -> Queries.qEmbedCosineTopK _,
    "q_lsh_ann"         -> Queries.qLshAnn _,
    "q_ivf_ann"         -> Queries.qIvfAnn _,
    "q_pq_ann"          -> Queries.qPqAnn _,
    "q_embed_neardup"   -> Queries.qEmbedNearDup _,
    "q_embed_quant"     -> Queries.qEmbedQuant _,
    "q_chunk_docs"      -> Queries.qChunkDocs _,
    "q_quant_ann"       -> Queries.qQuantAnn _,
    "q_lm_score"        -> Queries.qLmScore _,
    "q_ccnet_buckets"   -> Queries.qCcnetBuckets _,
    "q_semdedup"        -> Queries.qSemDedup _,
    "q_kmeans"          -> Queries.qKmeans _,
    "q_semdedup_incr"   -> Queries.qSemDedupIncr _,
    "q_text_quality"    -> Queries.qTextQuality _,
    "q_lang_id"         -> Queries.qLangId _,
    "q_token_count"     -> Queries.qTokenCount _,
    "q_bpe_count"       -> Queries.qBpeCount _,
    "q_bpe_learn"       -> Queries.qBpeLearn _,
    "q_bpe_encode"      -> Queries.qBpeEncode _,
    "q_fingerprint"     -> Queries.qFingerprint _,
    "q_tfexample"       -> Queries.qTfExample _,
    "q_mm_decode"       -> Queries.qMultimodalDecode _,
    "q_mm_audio"        -> Queries.qMultimodalAudio _,
    "q_mm_features"     -> Queries.qMultimodalFeatures _,
    "q_mm_frames"       -> Queries.qMultimodalFrames _,
    // curation (training-mix composition)
    "q_dsir"              -> Queries.qDsir _,
    "q_quality_clf"       -> Queries.qQualityClf _,
    "q_stratified_sample" -> Queries.qStratifiedSample _,
    "q_weighted_sample"   -> Queries.qWeightedSample _,
    "q_stratified_thin"   -> Queries.qStratifiedThin _,
    "q_domain_mix"        -> Queries.qDomainMix _,
    "q_hash_split"        -> Queries.qHashSplit _,
    "q_minhash_incr"      -> Queries.qMinhashIncr _,
    "q_corpus_report"     -> Queries.qCorpusReport _,
    "q_rand_proj"         -> Queries.qRandProj _,
    "q_embed_outliers"    -> Queries.qEmbedOutliers _,
    "q_heavy_hitters"     -> Queries.qHeavyHitters _,
    "q_key_skew"          -> Queries.qKeySkew _,
    "q_corpus_diff"       -> Queries.qCorpusDiff _,
    "q_seq_ids"           -> Queries.qSeqIds _,
    "q_corpus_jaccard"    -> Queries.qCorpusJaccard _,
    "q_tpch_q3"           -> Queries.qTpchQ3 _,
    "q_tpch_q5"           -> Queries.qTpchQ5 _,
    "q_increment_pipeline" -> Queries.qIncrementPipeline _,
    "q_pack_tokens"       -> Queries.qPackTokens _,
    "q_train_sequences"   -> Queries.qTrainSequences _,
    "q_shuffle_shards"    -> Queries.qShuffleShards _,
    "q_curation_pipeline" -> Queries.qCurationPipeline _,
    // composed examples
    "q_spammy_users"      -> Queries.qSpammyUsers _,
    "q_text_clean"        -> Queries.qTextClean _,
    "q_text_nfc"          -> Queries.qTextNfc _,
    "q_quality_rep"       -> Queries.qQualityRepetition _,
    "q_decontaminate"     -> Queries.qDecontaminate _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.all
}
