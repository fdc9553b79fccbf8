package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Oracles, Queries => Q}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * key maps to. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Q.q5MultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 core tube calculus
    "q_each" -> (Q.qEach _),
    "q_every" -> (Q.qEvery _),
    "q_map" -> (Q.qMap _),
    "q_mapm" -> (Q.qMapM _),
    "q_filter" -> (Q.qFilter _),
    "q_take" -> (Q.qTake _),
    "q_take_within" -> (Q.qTakeWithin _),
    "q_drop" -> (Q.qDrop _),
    "q_drop_within" -> (Q.qDropWithin _),
    "q_takewhile" -> (Q.qTakeWhile _),
    "q_flatmap" -> (Q.qFlatMap _),
    "q_compose" -> (Q.qCompose _),
    "q_cross" -> (Q.qCross _),
    "q_arith" -> (Q.qArith _),
    "q_reduce" -> (Q.qReduce _),
    "q_lfold" -> (Q.qLfold _),
    "q_merge" -> (Q.qMerge _),
    "q_merge_within" -> (Q.qMergeWithin _),
    "q_concat" -> (Q.qConcat _),
    // §2.2 sink algebra
    "q_sink_roundtrip" -> (Q.qSinkRoundtrip _),
    "q_route" -> (Q.qRoute _),
    "q_tee" -> (Q.qTee _),
    // §2.3 channel / arrow calculus
    "q_dimap" -> (Q.qDimap _),
    "q_arrow_first" -> (Q.qArrowFirst _),
    "q_fanout" -> (Q.qFanout _),
    "q_choice" -> (Q.qChoice _),
    "q_scan" -> (Q.qScan _),
    "q_running_avg" -> (Q.qRunningAvg _),
    // §2.4 relational analytics
    "q1_agg" -> (Q.q1Agg _),
    "q6_filter_agg" -> (Q.q6FilterAgg _),
    "q3_join" -> (Q.q3Join _),
    "q5_multijoin" -> (Q.q5MultiJoin _),
    "q_outer_having" -> (Q.qOuterHaving _),
    "q_full_outer" -> (Q.qFullOuter _),
    "q_semijoin" -> (Q.qSemiJoin _),
    "q_antijoin" -> (Q.qAntiJoin _),
    "q_distinct" -> (Q.qDistinct _),
    "q_topk" -> (Q.qTopK _),
    "q_window_rank" -> (Q.qWindowRank _),
    "q_rank_family" -> (Q.qRankFamily _),
    "q_stats" -> (Q.qStats _),
    "q_corr" -> (Q.qCorr _),
    "q_window_lag" -> (Q.qWindowLag _),
    "q_rollup" -> (Q.qRollup _),
    "q_cube" -> (Q.qCube _),
    "q_grouping_sets" -> (Q.qGroupingSets _),
    "q_outliers" -> (Q.qOutliers _),
    "q_window_range" -> (Q.qWindowRange _),
    "q_subquery" -> (Q.qSubquery _),
    "q_case_agg" -> (Q.qCaseAgg _),
    "q_pivot" -> (Q.qPivot _),
    "q_unpivot" -> (Q.qUnpivot _),
    "q_setops" -> (Q.qSetOps _),
    "q_string" -> (Q.qString _),
    "q_datetime" -> (Q.qDatetime _),
    "q_sessionize" -> (Q.qSessionize _),
    "q_funnel" -> (Q.qFunnel _),
    "q_json" -> (Q.qJson _),
    "q_asof" -> (Q.qAsof _),
    "q_percentile" -> (Q.qPercentile _),
    "q_percentile_approx" -> (Q.qPercentileApprox _),
    "q_histogram" -> (Q.qHistogram _),
    "q_approx_distinct" -> (Q.qApproxDistinct _),
    // §2.5 LLM-data-pipeline
    "q_tokens" -> (Q.qTokens _),
    "q_tokens_bpe" -> (Q.qTokensBpe _),
    "q_scrub" -> (Q.qScrub _),
    "q_ngram_top" -> (Q.qNgramTop _),
    "q_collocations" -> (Q.qCollocations _),
    "q_distinctive_terms" -> (Q.qDistinctiveTerms _),
    "q_ngram_top_sketch" -> (Q.qNgramTopSketch _),
    "q_quality" -> (Q.qQuality _),
    "q_quality_filter" -> (Q.qQualityFilter _),
    "q_repetition" -> (Q.qRepetition _),
    "q_langid" -> (Q.qLangId _),
    "q_fingerprint" -> (Q.qFingerprint _),
    "q_dedup_exact" -> (Q.qDedupExact _),
    "q_decontam" -> (Q.qDecontam _),
    "q_decontam_lsh" -> (Q.qDecontamLsh _),
    "q_decontam_ngram" -> (Q.qDecontamNgram _),
    "q_blocklist" -> (Q.qBlocklist _),
    "q_sample_stratified" -> (Q.qSampleStratified _),
    "q_mixture" -> (Q.qMixture _),
    "q_pack" -> (Q.qPack _),
    "q_split" -> (Q.qSplit _),
    "q_pipeline_e2e" -> (Q.qPipelineE2e _),
    "q_winnow" -> (Q.qWinnow _),
    "q_segment_dedup" -> (Q.qSegmentDedup _),
    "q_chunk" -> (Q.qChunk _),
    "q_dedup_minhash" -> (Q.qDedupMinhash _),
    "q_dedup_cluster" -> (Q.qDedupCluster _),
    "q_dedup_simhash" -> (Q.qDedupSimhash _),
    "q_ngram_jaccard" -> (Q.qNgramJaccard _),
    "q_dedup_embed" -> (Q.qDedupEmbed _),
    "q_knn_brute" -> (Q.qKnnBrute _),
    "q_knn_lsh" -> (Q.qKnnLsh _),
    "q_knn_ivf" -> (Q.qKnnIvf _),
    "q_multimodal" -> (Q.qMultimodal _),
    "q_mm_pipeline" -> (Q.qMmPipeline _),
    // §2.6 streaming twins (batch-equivalent checks)
    "q_stream_window" -> (Q.qStreamWindow _),
    "q_stream_sliding" -> (Q.qStreamSliding _),
    "q_stream_enrich" -> (Q.qStreamEnrich _),
    "q_stream_join" -> (Q.qStreamJoin _),
    "q_stream_blocklist" -> (Q.qStreamBlocklist _),
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. */
  def oracleSql: Map[String, String] = Oracles.sql
}
