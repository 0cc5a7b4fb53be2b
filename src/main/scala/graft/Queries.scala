package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** The engine's query inventory: one entry per operator family from
  * SURVEY.md §2 plus the training-data-pipeline extensions, each with an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Oracle-parity rules used throughout (types and values must hash-match
  * across engines):
  *   - aggregate sums of doubles go through DECIMAL(18,2) (exact,
  *     order-independent) and back to double;
  *   - counts stay BIGINT on both sides; Spark int-typed outputs
  *     (row_number, size) are cast to long or mirrored with INTEGER
  *     casts in SQL;
  *   - every hash is sha2-256-based (DuckDB sha256), including the
  *     minhash base hash (first 8 hex chars as int64), so fuzzy-dedup
  *     signatures are bit-identical across engines;
  *   - floating-point folds (vector dot products) run in double with a
  *     fixed fold order on both sides, and similarity outputs are rounded
  *     to 6 dp.
  */
object Queries {

  /** Loads a fixture table and normalizes the `ts` column of the events
    * fixture to TIMESTAMP (LTZ) regardless of which encoding the fixture
    * generator used. Three encodings have been observed across fixture
    * generations:
    *   - TIMESTAMP(NANOS) → Spark reads a long (with
    *     spark.sql.legacy.parquet.nanosAsLong=true, set in every session
    *     this engine builds). Converted with exact integer division
    *     (ns-since-epoch exceeds 2^53, so double math would corrupt low
    *     bits); the oracle's TIMESTAMP_NS → TIMESTAMP cast truncates
    *     identically.
    *   - TIMESTAMP_MICROS with isAdjustedToUTC=0 → Spark 4 reads
    *     TIMESTAMP_NTZ. Cast to TIMESTAMP — exact, because the session
    *     timezone is pinned to UTC in every session this engine builds.
    *   - TIMESTAMP_MICROS adjusted to UTC → already TIMESTAMP; no-op.
    */
  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }


  // Narrow forwarders for call sites that predate the round-11 split
  // (SparkEntry flagship, stream/parity specs); the registry maps below
  // remain the single source of truth.
  def scdStatus(s: SparkSession, dir: String): DataFrame =
    queries.ScdQueries.scdStatus(s, dir)
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    queries.CurationQueries.sessionWindows(s, dir)
  def groupPercentilesApprox(s: SparkSession, dir: String): DataFrame =
    queries.ScdQueries.groupPercentilesApprox(s, dir)
  def corpusScorecardFrame(docs: DataFrame): DataFrame =
    queries.AuditQueries.corpusScorecardFrame(docs)


  /** name -> (spark, sfDir) -> result. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_filter_project" -> (CoreQueries.scanFilterProject _),
    "q_when_case" -> (CoreQueries.whenCase _),
    "q_union_dedup" -> (CoreQueries.unionDedup _),
    "q_dup_gate" -> (CoreQueries.dupGate _),
    "q_agg_pricing" -> (CoreQueries.aggPricing _),
    "q_topk_per_group" -> (CoreQueries.topkPerGroup _),
    "q_window_lag_lead" -> (CoreQueries.windowLagLead _),
    "q_window_running" -> (CoreQueries.windowRunning _),
    "q_sessionize" -> (CoreQueries.sessionize _),
    "q_zorder_cells" -> (TextQueries.zorderCells _),
    "q_tfidf_topterms" -> (ScdQueries.tfidfTopTerms _),
    "q_quality_classifier" -> (ScdQueries.qualityClassifier _),
    "q_simsearch_pq" -> (SimsearchQueries.simsearchPq _),
    "q_simsearch_ivfpq" -> (SimsearchQueries.simsearchIvfPq _),
    "q_agg_rollup" -> (CoreQueries.aggRollup _),
    "q_agg_grouping_sets" -> (CoreQueries.aggGroupingSets _),
    "q_window_time_range" -> (CoreQueries.windowTimeRange _),
    "q_count_distinct" -> (CoreQueries.countDistinct _),
    "q_count_distinct_approx" -> (CoreQueries.countDistinctApprox _),
    "q_pivot_revenue" -> (CoreQueries.pivotRevenue _),
    "q_unpivot_metrics" -> (CoreQueries.unpivotMetrics _),
    "q_decontaminate_bloom" -> (ScdQueries.decontaminateBloom _),
    "q_semantic_dedup" -> (ScdQueries.semanticDedup _),
    "q_gaps_islands" -> (CoreQueries.gapsIslands _),
    "q_global_max_stamp" -> (CoreQueries.globalMaxStamp _),
    "q_row_fingerprint" -> (CoreQueries.rowFingerprint _),
    "q_join_revenue" -> (CoreQueries.joinRevenue _),
    "q_distinct_flags" -> (CoreQueries.distinctFlags _),
    "q_json_extract" -> (CoreQueries.jsonExtract _),
    "q_word_frequencies" -> (CoreQueries.wordFrequencies _),
    "q_heavy_hitters" -> (CoreQueries.heavyHitters _),
    "q_orders_by_month" -> (CoreQueries.ordersByMonth _),
    "q_scd_status" -> (ScdQueries.scdStatus _),
    "q_scd_merge_current" -> (ScdQueries.scdMergeCurrent _),
    "q_asof_join" -> (ScdQueries.asofJoin _),
    "q_asof_join_native" -> (ScdQueries.asofJoinNative _),
    "q_range_join" -> (ScdQueries.rangeJoin _),
    "q_sample_stratified" -> (ScdQueries.sampleStratified _),
    "q_sample_mix" -> (ScdQueries.sampleMix _),
    "q_doc_packing" -> (ScdQueries.docPacking _),
    "q_group_percentiles" -> (ScdQueries.groupPercentiles _),
    "q_group_percentiles_approx" -> (ScdQueries.groupPercentilesApprox _),
    "q_event_windows" -> (ScdQueries.eventWindows _),
    "q_salted_agg" -> (ScdQueries.saltedAgg _),
    "q_bm25" -> (ScdQueries.bm25Score _),
    "q_text_redact" -> (ScdQueries.textRedact _),
    "q_decontaminate" -> (ScdQueries.decontaminate _),
    "q_dedup_exact" -> (DedupQueries.dedupExact _),
    "q_dedup_minhash" -> (DedupQueries.dedupMinHash _),
    "q_dedup_incremental" -> (DedupQueries.dedupIncremental _),
    "q_dedup_clusters" -> (DedupQueries.dedupClusters _),
    "q_dedup_clusters_stars" -> (DedupQueries.dedupClustersStars _),
    "q_cluster_representatives" -> (DedupQueries.clusterRepresentatives _),
    "q_ngram_jaccard" -> (DedupQueries.ngramJaccardPairs _),
    "q_dedup_recall" -> (DedupQueries.dedupRecall _),
    "q_winnow_overlap" -> (DedupQueries.winnowOverlap _),
    "q_dedup_simhash" -> (DedupQueries.dedupSimHash _),
    "q_simsearch_topk" -> (SimsearchQueries.simsearchTopK _),
    "q_simsearch_lsh" -> (SimsearchQueries.simsearchLsh _),
    "q_simsearch_lsh_mp" -> (SimsearchQueries.simsearchLshMultiProbe _),
    "q_simsearch_ivf" -> (SimsearchQueries.simsearchIvf _),
    "q_embedding_quantized" -> (SimsearchQueries.embeddingQuantized _),
    "q_embedding_neardup" -> (SimsearchQueries.embeddingNearDup _),
    "q_text_stats" -> (TextQueries.textStats _),
    "q_text_repetition" -> (TextQueries.textRepetition _),
    "q_text_chunks" -> (TextQueries.textChunks _),
    "q_lang_id" -> (TextQueries.langId _),
    "q_lm_perplexity" -> (CurationQueries.lmPerplexity _),
    "q_lm_perplexity_kn" -> (CurationQueries.lmPerplexityKn _),
    "q_dup_spans" -> (CurationQueries.dupSpans _),
    "q_source_overlap" -> (CurationQueries.sourceOverlap _),
    "q_collocations" -> (CurationQueries.collocations _),
    "q_token_budget" -> (CurationQueries.tokenBudget _),
    "q_hard_negatives" -> (CurationQueries.hardNegatives _),
    "q_training_triplets" -> (CurationQueries.trainingTriplets _),
    "q_curriculum_bins" -> (CurationQueries.curriculumBins _),
    "q_shard_assign" -> (CurationQueries.shardAssign _),
    "q_source_caps" -> (CurationQueries.sourceCaps _),
    "q_anti_join" -> (CurationQueries.antiJoin _),
    "q_semi_join" -> (CurationQueries.semiJoin _),
    "q_length_histogram" -> (CurationQueries.lengthHistogram _),
    "q_session_windows" -> (CurationQueries.sessionWindows _),
    "q_cohort_retention" -> (CurationQueries.cohortRetention _),
    "q_agg_cube" -> (CurationQueries.aggCube _),
    "q_set_ops" -> (CurationQueries.setOps _),
    "q_sample_exact" -> (CurationQueries.sampleExact _),
    "q_train_test_split" -> (CurationQueries.trainTestSplit _),
    "q_global_topn" -> (CurationQueries.globalTopN _),
    "q_funnel" -> (CurationQueries.funnel _),
    "q_group_outliers" -> (CurationQueries.groupOutliers _),
    "q_bpe_merges" -> (CurationQueries.bpeMerges _),
    "q_edit_distance" -> (CurationQueries.editDistancePairs _),
    "q_distribution_drift" -> (CurationQueries.distributionDrift _),
    "q_psi_drift" -> (CurationQueries.psiDrift _),
    "q_containment" -> (CurationQueries.containmentPairs _),
    "q_multimodal_features" -> (MultimodalQueries.multimodalFeatures _),
    "q_graph_triangles" -> (GraphQueries.graphTriangles _),
    "q_graph_kcore" -> (GraphQueries.graphKcore _),
    "q_graph_pagerank" -> (GraphQueries.graphPageRank _),
    "q_graph_walks" -> (GraphQueries.graphWalks _),
    "q_inverted_index" -> (ProfilingQueries.invertedIndex _),
    "q_table_profile" -> (ProfilingQueries.tableProfile _),
    "q_quality_rules" -> (CurationQueries.qualityRules _),
    "q_dsir_weights" -> (CurationQueries.dsirWeights _),
    "q_snapshot_diff" -> (ProfilingQueries.snapshotDiff _),
    "q_corr_matrix" -> (ProfilingQueries.corrMatrix _),
    "q_ols_coeffs" -> (ProfilingQueries.olsCoeffs _),
    "q_pca_cov" -> (ProfilingQueries.pcaCov _),
    "q_mad_outliers" -> (ProfilingQueries.madOutliers _),
    "q_mad_outliers_approx" -> (ProfilingQueries.madOutliersApprox _),
    "q_embedding_centroids" -> (ProfilingQueries.embeddingCentroids _),
    "q_split_leakage_safe" -> (ProfilingQueries.splitLeakageSafe _),
    "q_blocklist" -> (ProfilingQueries.blocklistGate _),
    "q_source_overlap_sketch" -> (ProfilingQueries.sourceOverlapSketch _),
    "q_ann_recall" -> (ProfilingQueries.annRecall _),
    "q_weighted_sample" -> (ProfilingQueries.weightedSample _),
    "q_weighted_sample_grouped" -> (ProfilingQueries.weightedSampleGrouped _),
    "q_unicode_norm" -> (ProfilingQueries.unicodeNorm _),
    "q_decay_weights" -> (ProfilingQueries.decayWeights _),
    "q_compression_ratio" -> (ProfilingQueries.compressionRatio _),
    "q_source_divergence" -> (ProfilingQueries.sourceDivergence _),
    "q_zipf_slope" -> (ProfilingQueries.zipfSlope _),
    "q_diverse_subset" -> (ProfilingQueries.diverseSubset _),
    "q_mixture_plan" -> (ProfilingQueries.mixturePlan _),
    "q_vocab_coverage" -> (ProfilingQueries.vocabCoverage _),
    "q_distinctive_terms" -> (ProfilingQueries.distinctiveTerms _),
    "q_token_entropy" -> (ProfilingQueries.tokenEntropy _),
    "q_event_transitions" -> (ProfilingQueries.eventTransitions _),
    "q_dim_profile" -> (AuditQueries.dimProfile _),
    "q_centroid_outliers" -> (AuditQueries.centroidOutliers _),
    "q_lsh_plan" -> (AuditQueries.lshPlanQuery _),
    "q_quality_calibrated" -> (AuditQueries.qualityCalibrated _),
    "q_decontaminate_fuzzy" -> (AuditQueries.decontaminateFuzzy _),
    "q_curate_corpus" -> (AuditQueries.curateCorpus _),
    "q_source_dedup_matrix" -> (AuditQueries.sourceDedupMatrix _),
    "q_embedding_drift" -> (AuditQueries.embeddingDrift _),
    "q_term_burstiness" -> (AuditQueries.termBurstiness _),
    "q_ngram_novelty" -> (AuditQueries.ngramNovelty _),
    "q_vocab_growth" -> (AuditQueries.vocabGrowth _),
    "q_epoch_allocation" -> (AuditQueries.epochAllocation _),
    "q_corpus_scorecard" -> (AuditQueries.corpusScorecard _),
    "q_dedup_scrub" -> (AuditQueries.dedupScrub _),
    "q_readability" -> (AuditQueries.readability _),
    "q_matryoshka_recall" -> (AuditQueries.matryoshkaRecall _),
    "q_benford_audit" -> (AuditQueries.benfordAudit _),
    "q_fk_integrity" -> (AuditQueries.fkIntegrity _),
    "q_skew_report" -> (AuditQueries.skewReport _),
    "q_image_frame_matches" -> (MultimodalQueries.imageFrameMatch _),
    "q_image_neardup" -> (MultimodalQueries.imageNearDup _),
    "q_audio_neardup" -> (MultimodalQueries.audioNearDup _),
    "q_interarrival" -> (AuditQueries.interarrival _),
    "q_basket_affinity" -> (AuditQueries.basketAffinity _),
    "q_moments" -> (AuditQueries.moments _),
    "q_equidepth_histogram" -> (AuditQueries.equidepthHistogram _),
    "q_stream_scorecard" -> (StreamGateQueries.streamScorecard _),
    "q_stream_novelty" -> (StreamGateQueries.streamNovelty _),
    "q_stream_drift" -> (StreamGateQueries.streamDrift _),
    "q_stream_scd" -> (StreamGateQueries.streamScd _),
    "q_stream_kmv_overlap" -> (StreamGateQueries.streamKmvOverlap _),
    "q_stream_skew" -> (StreamGateQueries.streamSkew _))

  /** name -> DuckDB oracle SQL. EVERY registered query is oracled —
    * including q_compression_ratio (adjudicated on pinned kernel
    * constants since DuckDB has no deflate) and the LSH path (its
    * planes are sha-256-derived and DuckDB-reproducible).
    */
  val oracles: Map[String, String] = Map(
    "q_compression_ratio" -> ProfilingQueries.compressionRatioSql,
    "q_source_divergence" -> ProfilingQueries.sourceDivergenceSql,
    "q_zipf_slope" -> ProfilingQueries.zipfSlopeSql,
    "q_diverse_subset" -> ProfilingQueries.diverseSubsetSql,
    "q_mixture_plan" -> ProfilingQueries.mixturePlanSql,
    "q_vocab_coverage" -> ProfilingQueries.vocabCoverageSql,
    "q_distinctive_terms" -> ProfilingQueries.distinctiveTermsSql,
    "q_token_entropy" -> ProfilingQueries.tokenEntropySql,
    "q_event_transitions" -> ProfilingQueries.eventTransitionsSql,
    "q_dim_profile" -> AuditQueries.dimProfileSql,
    "q_centroid_outliers" -> AuditQueries.centroidOutliersSql,
    "q_lsh_plan" -> AuditQueries.lshPlanSql,
    "q_quality_calibrated" -> AuditQueries.qualityCalibratedSql,
    "q_decontaminate_fuzzy" -> AuditQueries.decontaminateFuzzySql,
    "q_curate_corpus" -> AuditQueries.curateCorpusSql,
    "q_source_dedup_matrix" -> AuditQueries.sourceDedupMatrixSql,
    "q_embedding_drift" -> AuditQueries.embeddingDriftSql,
    "q_term_burstiness" -> AuditQueries.termBurstinessSql,
    "q_ngram_novelty" -> AuditQueries.ngramNoveltySql,
    "q_vocab_growth" -> AuditQueries.vocabGrowthSql,
    "q_epoch_allocation" -> AuditQueries.epochAllocationSql,
    "q_corpus_scorecard" -> AuditQueries.corpusScorecardSql,
    "q_dedup_scrub" -> AuditQueries.dedupScrubSql,
    "q_readability" -> AuditQueries.readabilitySql,
    "q_matryoshka_recall" -> AuditQueries.matryoshkaRecallSql,
    "q_benford_audit" -> AuditQueries.benfordAuditSql,
    "q_fk_integrity" -> AuditQueries.fkIntegritySql,
    "q_skew_report" -> AuditQueries.skewReportSql,
    "q_image_frame_matches" -> MultimodalQueries.imageFrameMatchSql,
    "q_image_neardup" -> MultimodalQueries.imageNearDupSql,
    "q_audio_neardup" -> MultimodalQueries.audioNearDupSql,
    "q_interarrival" -> AuditQueries.interarrivalSql,
    "q_basket_affinity" -> AuditQueries.basketAffinitySql,
    "q_moments" -> AuditQueries.momentsSql,
    "q_equidepth_histogram" -> AuditQueries.equidepthHistogramSql,
    // the streamed folds are adjudicated against the BATCH queries'
    // oracles — the stream-equals-batch parity claim, driver-checked
    "q_stream_scorecard" -> AuditQueries.corpusScorecardSql,
    "q_stream_novelty" -> AuditQueries.ngramNoveltySql,
    "q_stream_drift" -> CurationQueries.distributionDriftSql,
    "q_stream_scd" -> ScdQueries.scdStatusSql,
    "q_stream_kmv_overlap" -> ProfilingQueries.sourceOverlapSketchSql,
    "q_stream_skew" -> AuditQueries.skewReportSql,
    "q_scan_filter_project" -> CoreQueries.scanFilterProjectSql,
    "q_when_case" -> CoreQueries.whenCaseSql,
    "q_union_dedup" -> CoreQueries.unionDedupSql,
    "q_dup_gate" -> CoreQueries.dupGateSql,
    "q_agg_pricing" -> CoreQueries.aggPricingSql,
    "q_topk_per_group" -> CoreQueries.topkPerGroupSql,
    "q_window_lag_lead" -> CoreQueries.windowLagLeadSql,
    "q_window_running" -> CoreQueries.windowRunningSql,
    "q_sessionize" -> CoreQueries.sessionizeSql,
    "q_zorder_cells" -> TextQueries.zorderCellsSql,
    "q_tfidf_topterms" -> ScdQueries.tfidfTopTermsSql,
    "q_quality_classifier" -> ScdQueries.qualityClassifierSql,
    "q_simsearch_pq" -> SimsearchQueries.simsearchPqSql,
    "q_simsearch_ivfpq" -> SimsearchQueries.simsearchIvfPqSql,
    "q_agg_rollup" -> CoreQueries.aggRollupSql,
    "q_agg_grouping_sets" -> CoreQueries.aggGroupingSetsSql,
    "q_window_time_range" -> CoreQueries.windowTimeRangeSql,
    "q_count_distinct" -> CoreQueries.countDistinctSql,
    "q_count_distinct_approx" -> CoreQueries.countDistinctApproxSql,
    "q_pivot_revenue" -> CoreQueries.pivotRevenueSql,
    "q_unpivot_metrics" -> CoreQueries.unpivotMetricsSql,
    "q_decontaminate_bloom" -> ScdQueries.decontaminateBloomSql,
    "q_semantic_dedup" -> ScdQueries.semanticDedupSql,
    "q_gaps_islands" -> CoreQueries.gapsIslandsSql,
    "q_global_max_stamp" -> CoreQueries.globalMaxStampSql,
    "q_row_fingerprint" -> CoreQueries.rowFingerprintSql,
    "q_join_revenue" -> CoreQueries.joinRevenueSql,
    "q_distinct_flags" -> CoreQueries.distinctFlagsSql,
    "q_json_extract" -> CoreQueries.jsonExtractSql,
    "q_word_frequencies" -> CoreQueries.wordFrequenciesSql,
    "q_heavy_hitters" -> CoreQueries.heavyHittersSql,
    "q_orders_by_month" -> CoreQueries.ordersByMonthSql,
    "q_scd_status" -> ScdQueries.scdStatusSql,
    "q_scd_merge_current" -> ScdQueries.scdMergeCurrentSql,
    "q_asof_join" -> ScdQueries.asofJoinSql,
    "q_asof_join_native" -> ScdQueries.asofJoinNativeSql,
    "q_range_join" -> ScdQueries.rangeJoinSql,
    "q_sample_stratified" -> ScdQueries.sampleStratifiedSql,
    "q_sample_mix" -> ScdQueries.sampleMixSql,
    "q_doc_packing" -> ScdQueries.docPackingSql,
    "q_group_percentiles" -> ScdQueries.groupPercentilesSql,
    "q_group_percentiles_approx" -> ScdQueries.groupPercentilesApproxSql,
    "q_event_windows" -> ScdQueries.eventWindowsSql,
    "q_salted_agg" -> ScdQueries.saltedAggSql,
    "q_bm25" -> ScdQueries.bm25ScoreSql,
    "q_text_redact" -> ScdQueries.textRedactSql,
    "q_decontaminate" -> ScdQueries.decontaminateSql,
    "q_dedup_exact" -> DedupQueries.dedupExactSql,
    "q_dedup_minhash" -> DedupQueries.dedupMinHashSql,
    "q_dedup_incremental" -> DedupQueries.dedupIncrementalSql,
    "q_dedup_clusters" -> DedupQueries.dedupClustersSql,
    "q_dedup_clusters_stars" -> DedupQueries.dedupClustersStarsSql,
    "q_ngram_jaccard" -> DedupQueries.ngramJaccardPairsSql,
    "q_winnow_overlap" -> DedupQueries.winnowOverlapSql,
    "q_dedup_simhash" -> DedupQueries.dedupSimHashSql,
    "q_simsearch_topk" -> SimsearchQueries.simsearchTopKSql,
    "q_simsearch_lsh" -> SimsearchQueries.simsearchLshSql,
    "q_simsearch_lsh_mp" -> SimsearchQueries.simsearchLshMultiProbeSql,
    "q_simsearch_ivf" -> SimsearchQueries.simsearchIvfSql,
    "q_embedding_quantized" -> SimsearchQueries.embeddingQuantizedSql,
    "q_embedding_neardup" -> SimsearchQueries.embeddingNearDupSql,
    "q_text_stats" -> TextQueries.textStatsSql,
    "q_text_repetition" -> TextQueries.textRepetitionSql,
    "q_text_chunks" -> TextQueries.textChunksSql,
    "q_lang_id" -> TextQueries.langIdSql,
    "q_lm_perplexity" -> CurationQueries.lmPerplexitySql,
    "q_lm_perplexity_kn" -> CurationQueries.lmPerplexityKnSql,
    "q_dup_spans" -> CurationQueries.dupSpansSql,
    "q_source_overlap" -> CurationQueries.sourceOverlapSql,
    "q_collocations" -> CurationQueries.collocationsSql,
    "q_token_budget" -> CurationQueries.tokenBudgetSql,
    "q_hard_negatives" -> CurationQueries.hardNegativesSql,
    "q_training_triplets" -> CurationQueries.trainingTripletsSql,
    "q_curriculum_bins" -> CurationQueries.curriculumBinsSql,
    "q_shard_assign" -> CurationQueries.shardAssignSql,
    "q_source_caps" -> CurationQueries.sourceCapsSql,
    "q_anti_join" -> CurationQueries.antiJoinSql,
    "q_semi_join" -> CurationQueries.semiJoinSql,
    "q_length_histogram" -> CurationQueries.lengthHistogramSql,
    "q_session_windows" -> CurationQueries.sessionWindowsSql,
    "q_cohort_retention" -> CurationQueries.cohortRetentionSql,
    "q_agg_cube" -> CurationQueries.aggCubeSql,
    "q_set_ops" -> CurationQueries.setOpsSql,
    "q_sample_exact" -> CurationQueries.sampleExactSql,
    "q_train_test_split" -> CurationQueries.trainTestSplitSql,
    "q_global_topn" -> CurationQueries.globalTopNSql,
    "q_funnel" -> CurationQueries.funnelSql,
    "q_group_outliers" -> CurationQueries.groupOutliersSql,
    "q_bpe_merges" -> CurationQueries.bpeMergesSql,
    "q_edit_distance" -> CurationQueries.editDistancePairsSql,
    "q_distribution_drift" -> CurationQueries.distributionDriftSql,
    "q_psi_drift" -> CurationQueries.psiDriftSql,
    "q_cluster_representatives" -> DedupQueries.clusterRepresentativesSql,
    "q_containment" -> CurationQueries.containmentPairsSql,
    "q_multimodal_features" -> MultimodalQueries.multimodalFeaturesSql,
    "q_graph_triangles" -> GraphQueries.graphTrianglesSql,
    "q_graph_kcore" -> GraphQueries.graphKcoreSql,
    "q_graph_pagerank" -> GraphQueries.graphPageRankSql,
    "q_graph_walks" -> GraphQueries.graphWalksSql,
    "q_inverted_index" -> ProfilingQueries.invertedIndexSql,
    "q_table_profile" -> ProfilingQueries.tableProfileSql,
    "q_quality_rules" -> CurationQueries.qualityRulesSql,
    "q_dsir_weights" -> CurationQueries.dsirWeightsSql,
    "q_snapshot_diff" -> ProfilingQueries.snapshotDiffSql,
    "q_corr_matrix" -> ProfilingQueries.corrMatrixSql,
    "q_ols_coeffs" -> ProfilingQueries.olsCoeffsSql,
    "q_pca_cov" -> ProfilingQueries.pcaCovSql,
    "q_mad_outliers" -> ProfilingQueries.madOutliersSql,
    "q_mad_outliers_approx" -> ProfilingQueries.madOutliersApproxSql,
    "q_embedding_centroids" -> ProfilingQueries.embeddingCentroidsSql,
    "q_split_leakage_safe" -> ProfilingQueries.splitLeakageSafeSql,
    "q_blocklist" -> ProfilingQueries.blocklistGateSql,
    "q_source_overlap_sketch" -> ProfilingQueries.sourceOverlapSketchSql,
    "q_ann_recall" -> ProfilingQueries.annRecallSql,
    "q_dedup_recall" -> DedupQueries.dedupRecallSql,
    "q_weighted_sample" -> ProfilingQueries.weightedSampleSql,
    "q_weighted_sample_grouped" -> ProfilingQueries.weightedSampleGroupedSql,
    "q_unicode_norm" -> ProfilingQueries.unicodeNormSql,
    "q_decay_weights" -> ProfilingQueries.decayWeightsSql)
}
