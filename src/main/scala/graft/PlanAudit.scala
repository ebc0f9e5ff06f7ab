package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = "/root/testdata/sf0.01"
    Seq("q1_agg", "q_broadcast_join", "q_filter", "q_map_project",
        "q_embed_topk", "q_join_inner", "q_window_fixed",
        // the round-3 reworked scale paths: salted top-k, max_by/min_by
        // aggregates, bounded ANN re-ranks, native shingle kernel
        "q_top_per_key", "q_latest_per_key", "q_distinct_rep",
        "q_ivf_ann", "q_lsh_ann", "q_dedup_minhash",
        // round-7: anchored calendar windows + single-scan BM25
        "q_window_weekly", "q_weekly_team_score", "q_bm25_batch",
        // round-7: bloom semi-join reduction + weighted sampling
        "q_bloom_semi", "q_weighted_sample", "q_lm_score",
        // round-10: windowed wordcount, PQ ANN, hybrid RRF
        "q_windowed_wc", "q_pq_ann", "q_hybrid_rrf",
        // round-10 session 2: DSIR, k-means, incremental semdedup,
        // tf.Example round-trip (q_bpe_learn is driver-iterative — its
        // per-round plans are the vocab aggregates, audited via DsirSpec-
        // style pins instead)
        "q_dsir", "q_kmeans", "q_semdedup_incr", "q_tfexample",
        // round-10 session 3: mixing/splits, incremental LSH, JL + outliers,
        // rollup report, heavy hitters, skew profile, snapshot diff,
        // distributed zipWithIndex, KMV jaccard, TPC-H shapes, NFC
        "q_domain_mix", "q_minhash_incr", "q_rand_proj", "q_embed_outliers",
        "q_corpus_report", "q_heavy_hitters", "q_key_skew", "q_corpus_diff",
        "q_seq_ids", "q_corpus_jaccard", "q_increment_pipeline",
        "q_tpch_q3", "q_tpch_q5", "q_text_nfc").foreach { name =>
      println(s"===== $name")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
