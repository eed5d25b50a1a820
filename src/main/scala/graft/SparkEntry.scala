package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, PipelineOracles, PipelineQueries}
import graft.functions.Multimodal
import graft.streaming.StreamingJobs

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one implemented operator class from
  * SURVEY.md §2 (or an LLM-pipeline operator); `oracleSql` holds the
  * DuckDB-equivalent SQL the driver hash-compares against. Column names
  * are aliased identically on both sides (the driver sorts columns by
  * name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q02RevenueByNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"   -> (Analytics.q01PricingSummary _),
    "q02_revenue_by_nation" -> (Analytics.q02RevenueByNation _),
    "q03_priority_count"    -> (Analytics.q03PriorityCount _),
    "q04_cust_no_orders"    -> (Analytics.q04CustomersWithoutOrders _),
    "q05_top_per_supplier"  -> (Analytics.q05TopPerSupplier _),
    "q06_last_event_per_user" -> (Analytics.q06LastEventPerUser _),
    "q07_daily_event_stats" -> (Analytics.q07DailyEventStats _),
    "q08_asof_event"        -> (Analytics.q08AsOfEvent _),
    "q09_conditional_agg"   -> (Analytics.q09ConditionalAgg _),
    "q10_json_props"        -> (Analytics.q10JsonProps _),
    "q11_token_stats"       -> (PipelineQueries.q11TokenStats _),
    "q12_dedup_exact"       -> (PipelineQueries.q12DedupExact _),
    "q13_fingerprint_dups"  -> (PipelineQueries.q13FingerprintDups _),
    "q14_minhash_sig"       -> (PipelineQueries.q14MinhashSig _),
    "q15_lsh_near_dups"     -> (PipelineQueries.q15LshNearDups _),
    "q16_simhash"           -> (PipelineQueries.q16Simhash _),
    "q17_quality"           -> (PipelineQueries.q17Quality _),
    "q18_lang_id"           -> (PipelineQueries.q18LangId _),
    "q19_knn_brute"         -> (PipelineQueries.q19KnnBrute _),
    "q20_emb_label_stats"   -> (PipelineQueries.q20EmbLabelStats _),
    "q21_ann_lsh"           -> (PipelineQueries.q21AnnLsh _),
    "q22_multimodal_meta"   -> (Multimodal.q22MultimodalMeta _),
    "q23_stream_hourly"     -> (StreamingJobs.hourlyEventCounts _),
    "q23b_stream_hourly_append" ->
      (StreamingJobs.hourlyEventCountsAppend _),
    "q24_embedding_dups"    -> (PipelineQueries.q24EmbeddingDups _),
    "q24b_embedding_dups_lsh" -> (PipelineQueries.q24bEmbeddingDupsLsh _),
    "q25_ann_ivf"           -> (PipelineQueries.q25AnnIvf _),
    "q26_multimodal_features" -> (Multimodal.q26MultimodalFeatures _),
    "q27_winnow_fingerprint"  -> (PipelineQueries.q27WinnowFingerprint _),
    "q28_dup_clusters"        -> (PipelineQueries.q28DupClusters _),
    "q29_quantize_int8"       -> (PipelineQueries.q29QuantizeInt8 _),
    "q30_simhash_dups"        -> (PipelineQueries.q30SimhashDups _),
    "q31_text_chunks"         -> (PipelineQueries.q31TextChunks _),
    "q32_tfidf_terms"         -> (PipelineQueries.q32TfidfTerms _),
    "q33_train_split"         -> (PipelineQueries.q33TrainSplit _),
    "q34_dedup_apply"         -> (PipelineQueries.q34DedupApply _),
    "q35_stream_dedup_users"  -> (StreamingJobs.distinctUsersPerType _),
    "q35b_stream_dedup_windowed" ->
      (StreamingJobs.distinctUsersPerTypeWindowed _),
    "q36_contamination"       -> (PipelineQueries.q36Contamination _),
    "q37_stream_sessions"     -> (StreamingJobs.userSessions _),
    "q37b_stream_sessions_append" ->
      (StreamingJobs.userSessionsAppend _),
    "q38_ngram_jaccard"       -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q38NgramJaccard(s, dir)),
    "q39_repetition"          -> (PipelineQueries.q39Repetition _),
    "q40_unigram_surprisal"   -> (PipelineQueries.q40UnigramSurprisal _),
    "q41_sequence_packing"    -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q41SequencePacking(s, dir)),
    "q42_cross_split_contamination" -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q42CrossSplitContamination(s, dir)),
    "q43_image_meta"          -> (Multimodal.q43ImageMeta _),
    "q44_image_resize"        -> (Multimodal.q44ImageResize _),
    "q45_source_mix"          -> (PipelineQueries.q45SourceMix _),
    "q46_filter_cascade"      -> (PipelineQueries.q46FilterCascade _),
    "q47_boilerplate"         -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q47Boilerplate(s, dir)),
    "q48_stream_near_dup"     -> (StreamingJobs.streamNearDupDocs _),
    "q48b_stream_near_dup_ttl" -> ((s: SparkSession, dir: String) =>
      StreamingJobs.streamNearDupDocsBounded(s, dir)),
    "q49_pii_scrub"           -> (PipelineQueries.q49PiiScrub _),
    "q50_domain_filter"       -> (PipelineQueries.q50DomainFilter _),
    "q51_semantic_dedup"      -> (PipelineQueries.q51SemanticDedup _),
    "q52_classifier_filter"   -> (PipelineQueries.q52ClassifierFilter _),
    "q53_corpus_recipe"       -> (PipelineQueries.q53CorpusRecipe _),
    "q54_lsh_tuned"           -> (PipelineQueries.q54LshTuned _),
    "q55_ann_recall"          -> (PipelineQueries.q55AnnRecall _),
    "q55b_ann_recall_probe1"  -> (PipelineQueries.q55bAnnRecallProbe1 _),
    "q56_bigram_lm"           -> (PipelineQueries.q56BigramLm _),
    "q56b_bigram_lm_pruned"   -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q56bBigramLmPruned(s, dir)),
    "q61_video_frame_near_dup" ->
      (graft.functions.Multimodal.q61VideoFrameNearDup _),
    "q62_audio_near_dup"      ->
      (graft.functions.Multimodal.q62AudioNearDup _),
    "q63_stream_image_dedup"  ->
      (graft.streaming.StreamingJobs.streamImageDedup _),
    "q63b_stream_image_dedup_ttl" -> ((s: SparkSession, dir: String) =>
      StreamingJobs.streamImageDedupBounded(s, dir)),
    "q64_recipe_yield"        -> (PipelineQueries.q64RecipeYield _),
    "q64b_recipe_yield_staged" -> (PipelineQueries.q64bRecipeYieldStaged _),
    "q65_dedup_agreement"     -> (PipelineQueries.q65DedupAgreement _),
    "q65b_dedup_agreement_star" ->
      (PipelineQueries.q65bDedupAgreementStar _),
    "q66_stream_quality_yield" ->
      (graft.streaming.StreamingJobs.streamQualityYield _),
    "q67_event_range_join"    -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q67EventRangeJoin(s, dir)),
    "q68_sessionize"          -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q68Sessionize(s, dir)),
    "q68b_sessionize_skew"    -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q68bSessionizeSkewSafe(s, dir)),
    "q69_funnel_matrix"       -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q69FunnelMatrix(s, dir)),
    "q70_hll_distinct"        -> (PipelineQueries.q70HllDistinct _),
    "q70b_hll_merge"          -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q70bHllMerge(s, dir)),
    "q71_quantile_sketch"     -> (PipelineQueries.q71QuantileSketch _),
    "q72_stream_funnel_join"  -> ((s: SparkSession, dir: String) =>
      StreamingJobs.streamFunnelJoin(s, dir)),
    "q73_heavy_hitters"       -> (PipelineQueries.q73HeavyHitters _),
    "q75_stream_funnel_outer" -> ((s: SparkSession, dir: String) =>
      StreamingJobs.streamFunnelJoinOuter(s, dir)),
    "q75b_stream_funnel_full" -> ((s: SparkSession, dir: String) =>
      StreamingJobs.streamFunnelJoinFullOuter(s, dir)),
    "q76_incremental_dedup"   -> (PipelineQueries.q76IncrementalDedup _),
    "q76b_growing_index_dedup" ->
      (PipelineQueries.q76bGrowingIndexDedup _),
    "q76c_compacted_index_dedup" ->
      (PipelineQueries.q76cCompactedIndexDedup _),
    "q25b_ann_ivf_append"     ->
      (PipelineQueries.q25bAnnIvfAppend _),
    "q81_ann_pq"              -> (PipelineQueries.q81AnnPq _),
    "q82_ann_ivfpq"           -> (PipelineQueries.q82AnnIvfPq _),
    "q25c_ann_ivf_retrain"    -> (PipelineQueries.q25cAnnIvfRetrain _),
    "q83_stream_ann_gate"     -> ((s: SparkSession, dir: String) =>
      StreamingJobs.streamAnnGate(s, dir)),
    "q77_ann_int8_rerank"     -> (PipelineQueries.q77AnnInt8Rerank _),
    "q78_selective_probe"     -> (Analytics.q78SelectiveProbe _),
    "q79_substring_dedup"     -> (PipelineQueries.q79SubstringDedup _),
    "q80_stream_corpus_probe" -> ((s: SparkSession, dir: String) =>
      StreamingJobs.streamCorpusProbe(s, dir)),
    "q79b_substring_dedup_2ph" ->
      (PipelineQueries.q79bSubstringDedup2Phase _),
    "q79c_substring_scrub"    ->
      (PipelineQueries.q79cSubstringScrub _),
    "q73b_heavy_hitters_sketch" ->
      (PipelineQueries.q73bHeavyHittersSketch _),
    "q71b_quantile_sketch_only" ->
      (PipelineQueries.q71bQuantileSketchOnly _),
    "q74_bucketed_join"       -> (Analytics.q74BucketedJoin _),
    "q57_image_dhash"         -> (Multimodal.q57ImageDhash _),
    "q58_audio_meta"          -> (Multimodal.q58AudioMeta _),
    "q59_video_frames"        -> (Multimodal.q59VideoFrames _),
    "q60_stratified_quota"    -> (PipelineQueries.q60StratifiedQuota _),
    "q82b_ann_ivfpq_residual" -> (PipelineQueries.q82bAnnIvfPqResidual _),
    "q55c_pq_recall"          -> (PipelineQueries.q55cPqRecall _),
    "q88_ivf_cell_balance"    -> (PipelineQueries.q88IvfCellBalance _),
    "q89_incremental_source_stats" ->
      (PipelineQueries.q89IncrementalSourceStats _),
    "q84_dsir_weights"        -> (PipelineQueries.q84DsirWeights _),
    "q85_epoch_shard_shuffle" -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q85EpochShardShuffle(s, dir)),
    "q86_hard_negatives"      -> (PipelineQueries.q86HardNegatives _),
    "q87_stream_dsir_gate"    -> ((s: SparkSession, dir: String) =>
      StreamingJobs.streamDsirGate(s, dir)),
    "q90_subword_tokenize"    -> (PipelineQueries.q90SubwordTokenize _),
    "q90b_token_packing"      -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q90bTokenPacking(s, dir)),
    "q86b_hard_negatives_ann" -> (PipelineQueries.q86bHardNegativesAnn _),
    "q91_stream_token_gate"   -> ((s: SparkSession, dir: String) =>
      StreamingJobs.streamTokenGate(s, dir)),
    "q92_bm25_more_like_this" -> (PipelineQueries.q92Bm25MoreLikeThis _),
    "q90c_bpe_tokenize"       -> (PipelineQueries.q90cBpeTokenize _),
    "q93_shard_export"        -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q93ShardExport(s, dir)),
    "q94_temperature_sample"  -> (PipelineQueries.q94TemperatureSample _),
    "q95_corpus_build"        -> ((s: SparkSession, dir: String) =>
      PipelineQueries.q95CorpusBuild(s, dir)),
    "q95b_corpus_build_incr"  -> (PipelineQueries.q95bCorpusBuildIncr _),
    "q96_token_budget_select" -> (PipelineQueries.q96TokenBudgetSelect _),
    "q97_stream_shard_ledger" -> (StreamingJobs.streamShardLedger _),
  ) ++ graft.queries.NearQueries.queries

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q03_priority_count" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q04_cust_no_orders" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin,

    "q05_top_per_supplier" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,

    "q06_last_event_per_user" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        |  round(CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE), 2) AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q07_daily_event_stats" ->
      """SELECT epoch_ns(ts) - (epoch_ns(ts) % 86400000000000) AS day_ns,
        |  event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q08_asof_event" ->
      """SELECT user_id, epoch_us(ts) AS asof_us, event_type AS asof_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events WHERE epoch_us(ts) <= 1704240000000000) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q09_conditional_agg" ->
      """SELECT event_type, total_value, n_rows, n_high, high_value,
        |  round(CAST(CAST(total_value AS DECIMAL(18,2)) - CAST(high_value AS DECIMAL(18,2)) AS DOUBLE), 2) AS low_value
        |FROM (
        |  SELECT event_type,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value,
        |    count(*) AS n_rows,
        |    count(*) FILTER (WHERE value > 100.0) AS n_high,
        |    round(CAST(sum(CASE WHEN value > 100.0 THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 2) AS high_value
        |  FROM events GROUP BY event_type) t
        |ORDER BY event_type""".stripMargin,

    "q10_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // q74: the bucketed co-located join must not change a single row —
    // the oracle is the plain join + aggregate over the ORIGINAL
    // parquet (bucketing is a physical-layout property only).
    "q78_selective_probe" ->
      """SELECT p_brand,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q74_bucketed_join" ->
      """SELECT o_orderpriority,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  ) ++ PipelineOracles.sql ++ graft.queries.NearOracles.sql
}
