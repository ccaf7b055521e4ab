package graft

/** The differential gate hash-compares output files, so every declared query
  * must be bit-stable run to run — no wall-clock, no partition-order leaks,
  * no nondeterministic tie-breaks (SURVEY.md §7.6). Exercise a representative
  * slice twice (covering sorts, window ties, hash-family ops, streaming
  * replays, sinks) and require identical collected output.
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val sampled = Seq(
    "q01_csv_scan", "q04_table_sink_append", "q12_anti_join_dedup",
    "q17_topk_groups", "q19_share_of_total", "q22_running_state",
    "q34_sentiment_udf", "q37_microbatch_trigger", "q44_minhash_neardup",
    "q45_cosine_topk", "q48_simhash", "q55_ann_lsh", "q57_sessionize",
    "q58_ann_ivf",
    // round-2 keys with ordering/state/salt hazards worth double-running
    "q60_vader", "q61_asof_join", "q62_range_join", "q64_rollup",
    "q67_cumulative_users", "q68_frame_sample", "q69_salted_count",
    // round-4 keys: multi-source DAG, streaming replays, fixpoint iteration,
    // window ties, random-salt join, catalog round-trip
    "q74_unified_pipeline", "q75_stateful_sessions", "q76_curation_chain",
    "q77_neardup_components", "q78_tfidf_topk", "q81_stream_stream_join",
    "q83_custom_udaf", "q85_salted_join", "q88_bucketed_join",
    // round-7 keys: two-phase binning (driver-collected cutpoints/offsets
    // must be run-stable), RDD-based feature extraction, full-outer merge
    "q91_sequence_packing", "q93_vocab_encode", "q96_decile_stats",
    "q110_multimodal_features", "q111_incremental_agg",
    // outer stream-stream join: null emission rides watermark eviction,
    // which the staged sentinels must make batch-schedule-independent
    "q114_stream_outer_join",
    // round-9 keys: RDD-based container walk; a FLOAT sum whose value is
    // only stable because of the ordered fold; index-probe band join;
    // forward-frame window carry; per-batch static re-resolution
    "q139_video_frames", "q140_token_entropy", "q141_incremental_neardup",
    "q142_asof_forward", "q143_stream_static_join",
    // round-12 keys: keyed two-phase offsets (driver-collected), per-source
    // k-heaps + a key-map metadata action, power iteration on checkpointed
    // metadata, RDD byte walks, double global ranks, observe() accumulators,
    // and a driver-solved chain — every driver-side step must be run-stable
    "q350_grouped_rank_normalize", "q355_bucketed_batching",
    "q356_bottomk_sample", "q362_conformal_bound", "q364_stationary_dist",
    "q370_png_chunk_walk", "q377_epoch_shuffle", "q386_observed_metrics",
    "q389_markov_attribution",
    // round-13 keys: chained broadcast iteration state (the integer GD
    // walk must be replay-stable), window ties broken by a packed key,
    // and a largest-remainder rank over a tiny global window
    "q393_logistic_gd", "q395_winnowing", "q401_neyman_allocation",
    // batch 2: bottom-k sketch retention (collision-free by bijection,
    // but the row_number cut must be run-stable), dual-direction window
    // leads + heap, calendar densification + 3 chained unions
    "q404_theta_sketch", "q409_skipgram_pairs", "q411_haar_wavelet",
    // batch 3: double-ranked reciprocal top-1, and a 10-round driver
    // greedy loop (each round's 1-row collect must be run-stable)
    "q412_mutual_knn", "q416_set_cover")

  for (name <- sampled) {
    test(s"$name is run-to-run deterministic") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, dir).collect().map(_.toString).toSeq
      val b = fn(spark, dir).collect().map(_.toString).toSeq
      assert(a == b, s"$name differs across runs")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }
}
