package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2B + §7.
  *
  * Every implemented operator from the SURVEY.md §2B inventory has a key in
  * `queries`; oracle-checkable ones also carry equivalent ANSI SQL in
  * `oracleSql` (run by the driver in DuckDB over the same parquet files).
  *
  * Determinism conventions (SURVEY.md §2B):
  *  - every row-level query ends in ORDER BY over a unique key;
  *  - every floating-point aggregate / computed float is `round(x, 4)` in
  *    BOTH formulations (summation-order ulp drift cannot break the hash);
  *  - nullable output keys are coalesced to sentinels (Spark sorts nulls
  *    first, DuckDB last);
  *  - column names are aliased identically in both formulations.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q6 shape, reference TpchQuery6.java:19-50) on
    * sf0.001; driver smoke-checks rows>0 — q6 returns exactly one row.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q6(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6"              -> (Relational.q6 _),
    "scan_project"    -> (Relational.scanProject _),
    "filter_conj"     -> (Relational.filterConj _),
    "join_inner_hash" -> (Relational.joinInnerHash _),
    "join_broadcast"  -> (Relational.joinBroadcast _),
    "join_multiway"   -> (Relational.joinMultiway _),
    "join_left_outer" -> (Relational.joinLeftOuter _),
    "join_semi"       -> (Relational.joinSemi _),
    "join_anti"       -> (Relational.joinAnti _),
    "join_range_theta"-> (Relational.joinRangeTheta _),
    "join_asof"       -> (Relational.joinAsof _),
    "join_salted"     -> (Relational.joinSalted _),
    "join_skew_aqe"   -> (Relational.joinSkewAqe _),
    "agg_group"       -> (Relational.aggGroup _),
    "agg_distinct"    -> (Relational.aggDistinct _),
    "agg_approx_distinct" -> (Analytic.aggApproxDistinct _),
    "agg_rollup"      -> (Analytic.aggRollup _),
    "agg_cube"        -> (Analytic.aggCube _),
    "agg_grouping_sets" -> (Analytic.aggGroupingSets _),
    "agg_stats"       -> (Analytic.aggStats _),
    "agg_percentile"  -> (Analytic.aggPercentile _),
    "agg_argmax"      -> (Analytic.aggArgmax _),
    "pivot_status"    -> (Analytic.pivotStatus _),
    "win_extra"       -> (Analytic.winExtra _),
    "win_rank"        -> (Analytic.winRank _),
    "win_running"     -> (Analytic.winRunning _),
    "win_lag_lead"    -> (Analytic.winLagLead _),
    "win_moving_avg"  -> (Analytic.winMovingAvg _),
    "sort_limit_topk" -> (Analytic.sortLimitTopk _),
    "set_union_all"   -> (Analytic.setUnionAll _),
    "set_union_distinct" -> (Analytic.setUnionDistinct _),
    "set_intersect"   -> (Analytic.setIntersect _),
    "set_except"      -> (Analytic.setExcept _),
    "str_funcs"       -> (Analytic.strFuncs _),
    "str_funcs2"      -> (Analytic.strFuncs2 _),
    "date_funcs"      -> (Analytic.dateFuncs _),
    "date_funcs2"     -> (Analytic.dateFuncs2 _),
    "cond_exprs"      -> (Analytic.condExprs _),
    "math_funcs"      -> (Analytic.mathFuncs _),
    "array_funcs"     -> (SemiStructured.arrayFuncs _),
    "array_funcs2"    -> (SemiStructured.arrayFuncs2 _),
    "array_explode"   -> (SemiStructured.arrayExplode _),
    "map_funcs"       -> (SemiStructured.mapFuncs _),
    "json_funcs"      -> (SemiStructured.jsonFuncs _),
    "stream_tumbling" -> (graft.streaming.Streams.tumbling _),
    "stream_sliding"  -> (graft.streaming.Streams.sliding _),
    "stream_session"  -> (graft.streaming.Streams.session _),
    "stream_late_data"-> (graft.streaming.Streams.lateData _),
    "stream_dedup"    -> (graft.streaming.Streams.streamDedup _),
    "stream_join"     -> (graft.streaming.Streams.streamJoin _),
    "dedup_exact"     -> (Dedup.dedupExact _),
    "dedup_ngram"     -> (Dedup.dedupNgram _),
    "dedup_incremental" -> (Dedup.dedupIncremental _),
    "dedup_near"      -> (Dedup.dedupNear _),
    "dedup_simhash"   -> (Dedup.dedupSimhash _),
    "sim_topk"        -> (Similarity.simTopk _),
    "sim_filtered"    -> (Similarity.simFiltered _),
    "dq_embedding"    -> (Similarity.dqEmbedding _),
    "sim_ann"         -> (Similarity.simAnn _),
    "sim_pq"          -> (Similarity.simPq _),
    "sim_ivfpq"       -> (Similarity.simIvfPq _),
    "sim_nndescent"   -> (Similarity.simNndescent _),
    "sim_graph_search" -> (Similarity.simGraphSearch _),
    "sim_hnsw"        -> (Similarity.simHnsw _),
    "sim_index_refresh" -> (Similarity.simIndexRefresh _),
    "sim_index_delete"  -> (Similarity.simIndexDelete _),
    "sim_filtered_graph" -> (Similarity.simFilteredGraph _),
    "dedup_embedding" -> (Similarity.dedupEmbedding _),
    "text_stats"      -> (TextAnalysis.textStats _),
    "token_count"     -> (TextAnalysis.tokenCount _),
    "token_bpe"       -> (TextAnalysis.tokenBpe _),
    "text_quality"    -> (TextAnalysis.textQuality _),
    "text_langid"     -> (TextAnalysis.textLangid _),
    "text_fingerprint"-> (TextAnalysis.textFingerprint _),
    "udf_suite"       -> (UdfSuite.udfSuite _),
    "sql_udf"         -> (UdfSuite.sqlUdf _),
    "multimodal_meta" -> (Multimodal.multimodalMeta _),
    "multimodal_decode" -> (Multimodal.multimodalDecode _),
    "multimodal_frames" -> (Multimodal.multimodalFrames _),
    "scan_csv"        -> (graft.sources.FormatSources.scanCsv _),
    "scan_jsonl"      -> (graft.sources.FormatSources.scanJsonl _),
    "text_pii_scrub"  -> (TextAnalysis.textPiiScrub _),
    "seq_pack"        -> (TextAnalysis.seqPack _),
    "dedup_keep_best" -> (Dedup.dedupKeepBest _),
    "corpus_hist"     -> (TextAnalysis.corpusHist _),
    "corpus_sample"   -> (TextAnalysis.corpusSample _),
    "text_tfidf"      -> (TextAnalysis.textTfidf _),
    "seq_pack_greedy" -> (TextAnalysis.seqPackGreedy _),
    "text_repetition" -> (TextAnalysis.textRepetition _),
    "decontam_overlap" -> (TextAnalysis.decontamOverlap _),
    "embed_cluster"   -> (Similarity.embedCluster _),
    "dedup_components"-> (Dedup.dedupComponents _),
    "funnel_conversion" -> (EventAnalytics.funnelConversion _),
    "retention_cohort"  -> (EventAnalytics.retentionCohort _),
    "anomaly_zscore"    -> (EventAnalytics.anomalyZscore _),
    "graph_pagerank"    -> (Graph.graphPagerank _),
    "scan_orc"          -> (graft.sources.FormatSources.scanOrc _),
    "scan_avro"         -> (graft.sources.FormatSources.scanAvro _),
    "scan_evolving"     -> (graft.sources.FormatSources.scanEvolving _),
    "scan_binary"       -> (graft.sources.FormatSources.scanBinary _),
    "scan_partitioned"  -> (graft.sources.FormatSources.scanPartitioned _),
    "scan_dpp"          -> (graft.sources.FormatSources.scanDpp _),
    "stream_static_join"-> (graft.streaming.Streams.streamStaticJoin _),
    "seq_shuffle"       -> (TextAnalysis.seqShuffle _),
    "corpus_mix"        -> (TextAnalysis.corpusMix _),
    "join_bucketed"     -> (Layout.joinBucketed _),
    "cdc_upsert"        -> (EventAnalytics.cdcUpsert _),
    "agg_sketch_rollup" -> (EventAnalytics.aggSketchRollup _),
    "pipeline_corpus"   -> (Pipeline.pipelineCorpus _),
    "dedup_spans"       -> (Dedup.dedupSpans _),
    "join_bloom"        -> (Relational.joinBloom _),
    "doc_chunk"         -> (TextAnalysis.docChunk _),
    "embed_quantize"    -> (Similarity.embedQuantize _),
    "agg_bitmap_distinct" -> (EventAnalytics.aggBitmapDistinct _),
    "compact_files"     -> (Layout.compactFiles _),
    "scd2_history"      -> (EventAnalytics.scd2History _),
    "sessionize_batch"  -> (EventAnalytics.sessionizeBatch _),
    "join_temporal"     -> (Relational.joinTemporal _),
    "vocab_topk"        -> (TextAnalysis.vocabTopk _),
    "stream_sink_files" -> (graft.streaming.Streams.streamSinkFiles _),
    "layout_sorted"     -> (Layout.layoutSorted _),
    "layout_zorder"     -> (Layout.layoutZorder _),
    "ts_resample"       -> (EventAnalytics.tsResample _),
    "scan_xml"          -> (graft.sources.FormatSources.scanXml _),
    "join_full_outer"   -> (Relational.joinFullOuter _),
    "subquery_correlated" -> (Relational.subqueryCorrelated _),
    "win_range_frames"  -> (Analytic.winRangeFrames _),
    "text_normalize"    -> (TextAnalysis.textNormalize _),
    "agg_approx_topk"   -> (EventAnalytics.aggApproxTopk _),
    "unpivot_melt"      -> (Analytic.unpivotMelt _),
    "agg_mode"          -> (Analytic.aggMode _),
    "win_distinct_count" -> (Analytic.winDistinctCount _),
    "graph_triangles"   -> (Graph.graphTriangles _),
    "ts_interpolate"    -> (EventAnalytics.tsInterpolate _),
    "agg_hist"          -> (Analytic.aggHist _),
    "stream_join_outer" -> (graft.streaming.Streams.streamJoinOuter _),
    "stream_update_mode" -> (graft.streaming.Streams.streamUpdateMode _),
    "agg_filtered"      -> (Analytic.aggFiltered _),
    "rollup_time_grain" -> (Analytic.rollupTimeGrain _),
    "text_entropy"      -> (TextAnalysis.textEntropy _),
    "stream_transform_state" ->
      (graft.streaming.Streams.streamTransformState _),
    "agg_listagg"       -> (Analytic.aggListagg _),
    "agg_bitwise"       -> (Analytic.aggBitwise _),
    "win_ignore_nulls"  -> (Analytic.winIgnoreNulls _),
    "join_lateral"      -> (Relational.joinLateral _),
    "stream_state_ttl"  -> (graft.streaming.Streams.streamStateTtl _),
    "text_perplexity"   -> (TextAnalysis.textPerplexity _),
    "graph_shortest_path" -> (Graph.graphShortestPath _),
    "stream_foreachbatch" ->
      (graft.streaming.Streams.streamForeachBatch _),
    "embed_rp"          -> (Similarity.embedRp _),
    "json_variant"      -> (SemiStructured.jsonVariant _),
    "pipeline_observe"  -> (Pipeline.pipelineObserve _),
    "url_funcs"         -> (SemiStructured.urlFuncs _),
    "str_collation"     -> (Analytic.strCollation _),
    "join_null_aware"   -> (Relational.joinNullAware _),
    "scan_text"         -> (graft.sources.FormatSources.scanText _),
    "id_assign"         -> (TextAnalysis.idAssign _),
    "write_partition_overwrite" -> (Layout.writePartitionOverwrite _),
    "agg_approx_percentile" -> (Analytic.aggApproxPercentile _),
    "str_edit_distance" -> (TextAnalysis.strEditDistance _),
    "anomaly_mad"       -> (EventAnalytics.anomalyMad _),
    "win_islands"       -> (EventAnalytics.winIslands _),
    "table_diff"        -> (EventAnalytics.tableDiff _),
    "agg_incremental_merge" -> (EventAnalytics.aggIncrementalMerge _),
    "ansi_try_funcs"    -> (Analytic.ansiTryFuncs _),
    "sql_params"        -> (Relational.sqlParams _),
    "table_transpose"   -> (Analytic.tableTranspose _),
    "ts_timezone"       -> (Analytic.tsTimezone _),
    "agg_boolean"       -> (Analytic.aggBoolean _),
    "write_rebalance"   -> (Layout.writeRebalance _),
    "sql_recursive_cte" -> (Relational.sqlRecursiveCte _),
    "variant_explode"   -> (SemiStructured.variantExplode _),
    "map_hof"           -> (SemiStructured.mapHof _),
    "scan_json_multiline" ->
      (graft.sources.FormatSources.scanJsonMultiline _),
    "str_mask"          -> (TextAnalysis.strMask _),
    "text_hashing_vec"  -> (TextAnalysis.textHashingVec _),
    "scan_corrupt_records" ->
      (graft.sources.FormatSources.scanCorruptRecords _),
    "set_union_evolving" -> (Analytic.setUnionEvolving _),
    "agg_session_window" -> (EventAnalytics.aggSessionWindow _),
    "join_asof_tolerance" -> (Relational.joinAsofTolerance _),
    "win_median_smooth" -> (Analytic.winMedianSmooth _),
    "corpus_split" -> (TextAnalysis.corpusSplit _),
    "text_ngram_colloc" -> (TextAnalysis.textNgramColloc _),
    "join_interval_overlap" -> (Relational.joinIntervalOverlap _),
    "ts_ewma" -> (EventAnalytics.tsEwma _),
    "ts_forecast_holt" -> (EventAnalytics.tsForecastHolt _),
    "ts_holt_winters" -> (EventAnalytics.tsHoltWinters _),
    "text_html_strip" -> (TextAnalysis.textHtmlStrip _),
    "scan_parquet_bloom" -> (graft.sources.FormatSources.scanParquetBloom _),
    "agg_quantile_bucket" -> (Analytic.aggQuantileBucket _),
    "merge_into" -> (Layout.mergeInto _),
    "agg_decimal" -> (Analytic.aggDecimal _),
    "tpch_q3" -> (Relational.tpchQ3 _),
    "tpch_q18" -> (Relational.tpchQ18 _),
    "dedup_containment" -> (Dedup.dedupContainment _),
    "seq_pattern" -> (EventAnalytics.seqPattern _),
    "table_snapshot" -> (Layout.tableSnapshot _),
    "dedup_url" -> (Dedup.dedupUrl _),
    "snapshot_expire" -> (Layout.snapshotExpire _),
    "snapshot_skipping" -> (Layout.snapshotSkipping _),
    "snapshot_concurrent" -> (Layout.snapshotConcurrent _),
    "merge_concurrent"  -> (Layout.mergeConcurrent _),
    "join_grid_2d" -> (Relational.joinGrid2d _),
    "agg_retract" -> (EventAnalytics.aggRetract _),
    "quality_logit" -> (TextAnalysis.qualityLogit _),
    "stream_merge_cdc" -> (graft.streaming.Streams.streamMergeCdc _),
    "join_asof_nearest" -> (Relational.joinAsofNearest _),
    "cbo_reorder" -> (Relational.cboReorder _),
    "sql_variables" -> (Relational.sqlVariables _),
    "set_multiset" -> (Analytic.setMultiset _),
    "win_top_per_group" -> (Analytic.winTopPerGroup _),
    "tpch_q1" -> (Relational.tpchQ1 _),
    "agg_regression" -> (Analytic.aggRegression _),
    "agg_multi_distinct" -> (Analytic.aggMultiDistinct _),
    "sql_pipe" -> (Relational.sqlPipe _),
    "scan_file_metadata" -> (sources.FormatSources.scanFileMetadata _),
    "agg_weighted" -> (Analytic.aggWeighted _),
    "join_band_bnlj" -> (Relational.joinBandBnlj _),
    "tpch_q5" -> (Relational.tpchQ5 _),
    "skyline_2d" -> (Relational.skyline2d _),
    "rank_bm25" -> (TextAnalysis.rankBm25 _),
    "tpch_q7" -> (Relational.tpchQ7 _),
    "tpch_q8" -> (Relational.tpchQ8 _),
    "tpch_q10" -> (Relational.tpchQ10 _),
    "tpch_q13" -> (Relational.tpchQ13 _),
    "tpch_q14" -> (Relational.tpchQ14 _),
    "tpch_q15" -> (Relational.tpchQ15 _),
    "tpch_q17" -> (Relational.tpchQ17 _),
    "tpch_q19" -> (Relational.tpchQ19 _),
    "tpch_q22" -> (Relational.tpchQ22 _),
    "win_ntile" -> (Analytic.winNtile _),
    "text_readability" -> (TextAnalysis.textReadability _),
    "stat_chi2" -> (EventAnalytics.statChi2 _),
    "corpus_drift" -> (TextAnalysis.corpusDrift _),
    "stat_ks" -> (EventAnalytics.statKs _),
    "corpus_gini" -> (TextAnalysis.corpusGini _),
    "tpch_q2" -> (Relational.tpchQ2 _),
    "tpch_q4" -> (Relational.tpchQ4 _),
    "tpch_q9" -> (Relational.tpchQ9 _),
    "tpch_q11" -> (Relational.tpchQ11 _),
    "tpch_q12" -> (Relational.tpchQ12 _),
    "tpch_q16" -> (Relational.tpchQ16 _),
    "tpch_q20" -> (Relational.tpchQ20 _),
    "tpch_q21" -> (Relational.tpchQ21 _),
    "stat_mannwhitney" -> (EventAnalytics.statMannWhitney _),
    "dq_expectations" -> (Pipeline.dqExpectations _),
    "token_bpe_train" -> (TextAnalysis.tokenBpeTrain _),
    "agg_countmin" -> (EventAnalytics.aggCountMin _),
    "rank_rrf" -> (TextAnalysis.rankRrf _),
    "stat_ttest" -> (EventAnalytics.statTtest _),
    "eval_retrieval" -> (TextAnalysis.evalRetrieval _),
    "eval_auc" -> (EventAnalytics.evalAuc _),
    "sample_stratified" -> (TextAnalysis.sampleStratified _),
    "join_spatial_knn" -> (Relational.joinSpatialKnn _),
    "eval_calibration" -> (EventAnalytics.evalCalibration _),
    "ts_autocorr" -> (EventAnalytics.tsAutocorr _),
    "dq_kanonymity" -> (Pipeline.dqKanonymity _),
    "eval_confusion" -> (EventAnalytics.evalConfusion _),
    "stat_bootstrap" -> (EventAnalytics.statBootstrap _),
    "feat_minmax" -> (EventAnalytics.featMinmax _),
    "ts_changepoint" -> (EventAnalytics.tsChangepoint _),
    "event_attribution" -> (EventAnalytics.eventAttribution _),
    "eval_regression" -> (EventAnalytics.evalRegression _),
    "ts_seasonal_profile" -> (EventAnalytics.tsSeasonalProfile _),
    "assoc_rules" -> (EventAnalytics.assocRules _),
    "feat_target_encode" -> (EventAnalytics.featTargetEncode _),
    "dq_profile" -> (Pipeline.dqProfile _),
    "pipeline_events" -> (Pipeline.pipelineEvents _),
    "embed_matryoshka" -> (Similarity.embedMatryoshka _),
    "embed_pca_power" -> (Similarity.embedPcaPower _),
    "graph_kcore" -> (Graph.graphKcore _),
    "graph_communities" -> (Graph.graphCommunities _),
    "ts_interarrival" -> (EventAnalytics.tsInterarrival _),
    "text_ttr" -> (TextAnalysis.textTtr _),
    "stat_gini_impurity" -> (EventAnalytics.statGiniImpurity _),
    "anomaly_rolling_z" -> (EventAnalytics.anomalyRollingZ _),
    "eval_pr_curve" -> (EventAnalytics.evalPrCurve _),
    "stat_benford" -> (EventAnalytics.statBenford _),
    "text_code_detect" -> (TextAnalysis.textCodeDetect _),
    "sample_tiered" -> (TextAnalysis.sampleTiered _),
    "stat_runs" -> (EventAnalytics.statRuns _),
    "eval_ndcg" -> (TextAnalysis.evalNdcg _),
    "eval_bleu" -> (TextAnalysis.evalBleu _),
    "eval_rouge" -> (TextAnalysis.evalRouge _),
    "corpus_budget_cut" -> (TextAnalysis.corpusBudgetCut _),
    "event_transitions" -> (EventAnalytics.eventTransitions _),
    "eval_kappa" -> (EventAnalytics.evalKappa _),
    "agg_moments" -> (Analytic.aggMoments _),
    "dq_referential" -> (Pipeline.dqReferential _),
    "ts_decompose" -> (EventAnalytics.tsDecompose _),
    "write_codecs" -> (Layout.writeCodecs _),
  )

  /** The token_bpe_train oracle: all 10 training rounds unrolled as
    * MATERIALIZED CTE stages (the graph_pagerank multi-round-oracle
    * lesson — without MATERIALIZED DuckDB would re-inline each round's
    * vocab into the next, doubling work per stage). Each stage replays
    * the Spark round exactly: positional parallel-unnest shift-zip for
    * pair counts, the (count DESC, lexicographic) argmax, and the
    * boundary-safe delimited replace as the merge. */
  private def bpeTrainOracleSql: String = {
    val stages = (1 to 10).map { i =>
      val pv = s"v${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  SELECT lsym, rsym, CAST(sum(wcount) AS BIGINT) AS pcount
         |  FROM (
         |    SELECT unnest(ss[1:len(ss)-1]) AS lsym,
         |           unnest(ss[2:len(ss)]) AS rsym, wcount
         |    FROM (SELECT string_split(substr(state, 2, len(state) - 2),
         |                              '><') AS ss, wcount FROM $pv)
         |  ) GROUP BY 1, 2
         |), b$i AS MATERIALIZED (
         |  SELECT CAST($i AS BIGINT) AS step, lsym, rsym,
         |         lsym || rsym AS merged, pcount
         |  FROM p$i ORDER BY pcount DESC, lsym, rsym LIMIT 1
         |), v$i AS MATERIALIZED (
         |  SELECT replace(state, '<' || lsym || '><' || rsym || '>',
         |                 '<' || lsym || rsym || '>') AS state, wcount
         |  FROM $pv, b$i
         |)""".stripMargin
    }.mkString(", ")
    val union = (1 to 10).map(i => s"SELECT * FROM b$i")
      .mkString(" UNION ALL ")
    s"""WITH v0 AS MATERIALIZED (
       |  SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS state,
       |         CAST(count(*) AS BIGINT) AS wcount
       |  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
       |          AS w
       |        FROM documents)
       |  WHERE w <> ''
       |  GROUP BY 1
       |), $stages
       |SELECT step, lsym, rsym, merged, pcount
       |FROM ($union)
       |ORDER BY step""".stripMargin
  }

  /** The token_bpe oracle (VERDICT r16 item 5 — the last non-streaming
    * no-oracle key): the two-pass batched learner AND the greedy merge
    * APPLY replayed end-to-end in DuckDB. Same trajectory-replay
    * technique as [[bpeTrainOracleSql]] — the per-word greedy loop
    * ("merge ALL occurrences of the lowest-rank adjacent pair, repeat")
    * unrolls as MATERIALIZED CTE stages over the delimited word state
    * ('<a><b>…'; replace('<a><b>','<ab>') is the left-to-right
    * merge-all, exactly [[graft.operators.TextAnalysis.bpeEncodeWord]]).
    * Seven stages suffice: each live stage shortens a word's symbol
    * sequence by ≥1 and the pre-tokenizer's longest word is 8 chars
    * (max over the corpus AND the mult-10/100 generators, whose only
    * longer-word source is 6-digit doc ids); converged words pass
    * through stages as no-ops (NULL best pair → state unchanged). A
    * `guard` CTE (ADVICE r17) makes the unroll assumption SELF-CHECK:
    * if any post-final-stage word still carries a rank-table pair (a
    * 9+-char alpha run the stage count didn't cover), the oracle
    * errors with a message naming the stage cap instead of silently
    * hash-mismatching the engine's fully-converged output.
    * arg_min picks each word's lowest-rank pair (ranks are unique by
    * row_number, so the argmin is total). Pass-B rank offset is
    * count(pa), not the 128 cap — the learner's zipWithIndex continues
    * from however many pairs pass A actually produced. */
  private def bpeApplyOracleSql: String = {
    val Stages = 7
    val MergeIdBase = graft.operators.TextAnalysis.BpeMergeIdBase
    val re = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
    def loopStages(prefix: String, init: String, ranks: String)
        : (String, String) = {
      val ctes = (1 to Stages).map { i =>
        val prev = if (i == 1) init else s"$prefix${i - 1}"
        val cur = s"$prefix$i"
        s"""${cur}b AS MATERIALIZED (
           |  SELECT word, arg_min(lsym, rnk) AS la, arg_min(rsym, rnk) AS lb
           |  FROM (
           |    SELECT p.word, p.lsym, p.rsym, r.rnk
           |    FROM (
           |      SELECT word, unnest(ss[1:len(ss)-1]) AS lsym,
           |             unnest(ss[2:len(ss)]) AS rsym
           |      FROM (SELECT word, string_split(substr(state, 2,
           |                   len(state) - 2), '><') AS ss FROM $prev)
           |    ) p JOIN $ranks r ON p.lsym = r.lsym AND p.rsym = r.rsym
           |  ) GROUP BY word
           |), $cur AS MATERIALIZED (
           |  SELECT e.word,
           |         CASE WHEN b.word IS NULL THEN e.state
           |              ELSE replace(e.state,
           |                           '<' || b.la || '><' || b.lb || '>',
           |                           '<' || b.la || b.lb || '>') END
           |           AS state
           |  FROM $prev e LEFT JOIN ${cur}b b USING (word)
           |)""".stripMargin
      }.mkString(", ")
      (ctes, s"$prefix$Stages")
    }
    val (stA, lastA) = loopStages("ea", "e0", "pa")
    val (stF, lastF) = loopStages("ef", "e0", "ranks")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT w AS word, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(regexp_extract_all(lower(trim(text)),
       |               '$re')) AS w FROM documents)
       |  GROUP BY 1
       |), e0 AS MATERIALIZED (
       |  SELECT word, regexp_replace(word, '(.)', '<\\1>', 'g') AS state
       |  FROM w0
       |), paw AS MATERIALIZED (
       |  SELECT lsym, rsym, CAST(sum(n) AS BIGINT) AS wgt
       |  FROM (SELECT unnest(ss[1:len(ss)-1]) AS lsym,
       |               unnest(ss[2:len(ss)]) AS rsym, n
       |        FROM (SELECT string_split(substr(state, 2,
       |                     len(state) - 2), '><') AS ss, n
       |              FROM e0 JOIN w0 USING (word)))
       |  GROUP BY 1, 2
       |), pa AS MATERIALIZED (
       |  SELECT lsym, rsym,
       |         CAST(row_number() OVER (ORDER BY wgt DESC, lsym, rsym)
       |              AS BIGINT) - 1 AS rnk
       |  FROM paw ORDER BY wgt DESC, lsym, rsym LIMIT 128
       |), $stA, pbw AS MATERIALIZED (
       |  SELECT lsym, rsym, CAST(sum(n) AS BIGINT) AS wgt
       |  FROM (SELECT unnest(ss[1:len(ss)-1]) AS lsym,
       |               unnest(ss[2:len(ss)]) AS rsym, n
       |        FROM (SELECT string_split(substr(state, 2,
       |                     len(state) - 2), '><') AS ss, n
       |              FROM $lastA JOIN w0 USING (word)))
       |  GROUP BY 1, 2
       |), pb AS MATERIALIZED (
       |  SELECT lsym, rsym,
       |         (SELECT count(*) FROM pa)
       |           + CAST(row_number() OVER (ORDER BY wgt DESC, lsym,
       |                  rsym) AS BIGINT) - 1 AS rnk
       |  FROM pbw ORDER BY wgt DESC, lsym, rsym LIMIT 128
       |), ranks AS MATERIALIZED (
       |  SELECT * FROM pa UNION ALL SELECT * FROM pb
       |), symid AS MATERIALIZED (
       |  SELECT lsym || rsym AS surface, $MergeIdBase + min(rnk) AS sid
       |  FROM ranks GROUP BY 1
       |), $stF, guard AS MATERIALIZED (
       |  SELECT CASE WHEN count(*) = 0 THEN 0
       |              ELSE length(error('token_bpe oracle: '
       |                || count(*) || ' words still carry a mergeable '
       |                || 'pair after $Stages unrolled stages - the '
       |                || 'corpus has a longer pre-token than the '
       |                || 'unroll assumed; raise Stages')) END AS ok
       |  FROM (
       |    SELECT p.word
       |    FROM (
       |      SELECT word, unnest(ss[1:len(ss)-1]) AS lsym,
       |             unnest(ss[2:len(ss)]) AS rsym
       |      FROM (SELECT word, string_split(substr(state, 2,
       |                   len(state) - 2), '><') AS ss FROM $lastF)
       |    ) p JOIN ranks r ON p.lsym = r.lsym AND p.rsym = r.rsym
       |  )
       |), wids AS MATERIALIZED (
       |  SELECT word, CAST(max(ntk) AS BIGINT) AS n_toks,
       |         string_agg(CAST(CASE WHEN length(sym) = 1
       |                              THEN unicode(sym)
       |                              ELSE s.sid END AS VARCHAR),
       |                    ' ' ORDER BY pos) AS ids_str
       |  FROM (SELECT word, unnest(ss) AS sym,
       |               unnest(range(1, len(ss) + 1)) AS pos,
       |               len(ss) AS ntk
       |        FROM (SELECT word, string_split(substr(state, 2,
       |                     len(state) - 2), '><') AS ss FROM $lastF)) y
       |  LEFT JOIN symid s ON y.sym = s.surface
       |  GROUP BY word
       |), dagg AS MATERIALIZED (
       |  SELECT doc_id, CAST(max(nw) AS BIGINT) AS n_words,
       |         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |         string_agg(ids_str, ' ' ORDER BY pos) AS token_ids_str
       |  FROM (SELECT doc_id, unnest(ws) AS word,
       |               unnest(range(1, len(ws) + 1)) AS pos,
       |               len(ws) AS nw
       |        FROM (SELECT doc_id, regexp_extract_all(lower(trim(text)),
       |                     '$re') AS ws FROM documents))
       |  JOIN wids USING (word)
       |  GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |       COALESCE(a.n_words, 0) AS n_words,
       |       COALESCE(a.n_tokens, 0) AS n_tokens,
       |       CAST(length(lower(trim(d.text))) AS BIGINT) AS n_chars_norm,
       |       CASE WHEN COALESCE(a.n_tokens, 0) > 0
       |            THEN round(CAST(length(lower(trim(d.text))) AS DOUBLE)
       |                       / a.n_tokens, 4) END AS chars_per_token,
       |       COALESCE(a.token_ids_str, '') AS token_ids_str
       |FROM documents d LEFT JOIN dagg a USING (doc_id)
       |CROSS JOIN guard
       |ORDER BY doc_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // exact 1e-4-unit integer sum (r15 flip-class audit — identical
    // expression in the Spark formulation)
    "q6" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount
        |                               * 1e4) AS BIGINT)) AS DOUBLE)
        |             / 1e4, 4) AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "scan_project" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    "filter_conj" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       l_returnflag, l_quantity, l_discount, l_tax
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_quantity BETWEEN 10 AND 20
        |  AND (l_discount < 0.03 OR l_tax > 0.05)
        |  AND l_linestatus IS NOT NULL
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    "join_inner_hash" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "join_broadcast" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,

    "join_multiway" ->
      """SELECT n_name,
        |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                                 * 1e4) AS BIGINT)) AS DOUBLE)
        |             / 1e4, 4) AS revenue,
        |       count(*) AS n_items
        |FROM region
        |JOIN nation   ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey,
        |       coalesce(o_orderkey, -1)  AS o_key,
        |       coalesce(o_totalprice, 0.0) AS price
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_key""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "join_range_theta" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       l_extendedprice, p_retailprice
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey AND l_extendedprice > p_retailprice * 55.0
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    "join_asof" ->
      """SELECT event_id, matched_order FROM (
        |  SELECT e.event_id,
        |         coalesce(o.o_orderkey, -1) AS matched_order,
        |         row_number() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey
        |   AND o.o_orderdate <= e.ts - INTERVAL 26 YEAR
        |) WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "join_salted" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    // The AQE skew split is correctness-neutral plan surgery — the
    // oracle replays the plain hot-key join (same contract style as
    // join_salted / join_bloom).
    "join_skew_aqe" ->
      """WITH f AS (
        |  SELECT CASE WHEN l_orderkey % 100 < 90 THEN 0
        |              ELSE l_orderkey END AS k,
        |         l_extendedprice
        |  FROM lineitem
        |)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |       round(sum(l_extendedprice) / 1000000.0, 4) AS revenue_m
        |FROM f JOIN orders ON o_orderkey = k
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Exact-integer money sums (r15 mult-10 find): float Σ ep·(1−disc)
    // reaches 4.8e10 at 6M rows where round(·,4) sits at ulp scale.
    "agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |                  AS DOUBLE) / 100, 4) AS sum_base_price,
        |       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |                  AS DOUBLE) / 10000, 4) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |                  AS DOUBLE) / 100 / count(*), 4) AS avg_price,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct" ->
      """SELECT o_orderpriority,
        |       count(DISTINCT o_custkey) AS n_cust,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       count(*) AS n_rows,
        |       GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,

    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                  AS DOUBLE) / 100, 4) AS sum_price,
        |       count(*) AS n_orders,
        |       GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |       round(stddev_samp(l_quantity), 4) AS sd_qty,
        |       round(var_samp(l_quantity), 4) AS var_qty,
        |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_percentile" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Ordered array_agg replays the deterministic tie-break (smallest
    // orderkey on an exact price tie — the r15 mult-10 find).
    "agg_argmax" ->
      """SELECT o_orderpriority,
        |       (array_agg(o_orderkey
        |                  ORDER BY o_totalprice DESC, o_orderkey ASC))[1]
        |         AS best_order,
        |       (array_agg(o_orderkey
        |                  ORDER BY o_totalprice ASC, o_orderkey ASC))[1]
        |         AS worst_order,
        |       round(max(o_totalprice), 4) AS best_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "pivot_status" ->
      """SELECT o_orderpriority,
        |       round(CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                           FILTER (o_orderstatus = 'F'), 0) AS DOUBLE)
        |             / 100, 4) AS f_total,
        |       round(CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                           FILTER (o_orderstatus = 'O'), 0) AS DOUBLE)
        |             / 100, 4) AS o_total,
        |       round(CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                           FILTER (o_orderstatus = 'P'), 0) AS DOUBLE)
        |             / 100, 4) AS p_total
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "win_extra" ->
      """SELECT c_custkey,
        |       round(percent_rank() OVER w, 4) AS pct_rank,
        |       round(cume_dist() OVER w, 4) AS cume,
        |       first_value(c_custkey) OVER wf AS poorest,
        |       last_value(c_custkey) OVER wf AS richest,
        |       nth_value(c_custkey, 3) OVER wf AS third
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey),
        |       wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,

    "win_rank" ->
      """SELECT c_custkey, c_nationkey,
        |       row_number() OVER (PARTITION BY c_nationkey
        |                          ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |       ntile(4)     OVER (PARTITION BY c_nationkey
        |                          ORDER BY c_acctbal DESC, c_custkey) AS quartile,
        |       rank()       OVER (PARTITION BY c_nationkey
        |                          ORDER BY c_mktsegment) AS seg_rank,
        |       dense_rank() OVER (PARTITION BY c_nationkey
        |                          ORDER BY c_mktsegment) AS seg_dense_rank
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "win_running" ->
      """SELECT o_orderkey, o_custkey,
        |       round(sum(o_totalprice) OVER w, 4) AS running_total,
        |       count(*) OVER w AS running_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "win_lag_lead" ->
      """SELECT event_id,
        |       lag(value, 1)  OVER w AS prev_value,
        |       lead(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "win_moving_avg" ->
      """SELECT event_id,
        |       round(avg(value) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id
        |                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
        |         AS moving_avg
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "set_union_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
        |ORDER BY custkey""".stripMargin,

    "set_union_distinct" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
        |ORDER BY custkey""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
        |ORDER BY custkey""".stripMargin,

    "set_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
        |ORDER BY custkey""".stripMargin,

    "str_funcs" ->
      """SELECT p_partkey,
        |       lower(p_name) AS lname,
        |       upper(p_brand) AS ubrand,
        |       substring(p_name, 1, 8) AS prefix8,
        |       length(p_name) AS name_len,
        |       trim(p_name) AS trimmed,
        |       concat(p_brand, '#', p_type) AS brand_type,
        |       p_name LIKE '%an%' AS has_an,
        |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |       len(string_split(p_name, ' ')) AS n_tokens
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "str_funcs2" ->
      """SELECT p_partkey,
        |       lpad(p_brand, 12, '_') AS padded,
        |       translate(p_name, 'aeiou', 'AEIOU') AS devoweled,
        |       repeat(p_brand, 2) AS doubled,
        |       reverse(p_name) AS reversed,
        |       levenshtein(p_brand, p_type) AS edit_dist,
        |       left(p_name, 5) AS head5,
        |       right(p_name, 5) AS tail5
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "date_funcs" ->
      """SELECT o_orderkey,
        |       year(o_orderdate) AS yr,
        |       month(o_orderdate) AS mo,
        |       day(o_orderdate) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |       datediff('day', o_orderdate, DATE '2002-01-01') AS days_to_2002,
        |       CAST(o_orderdate AS DATE) + 30 AS plus30,
        |       strftime(o_orderdate, '%Y-%m-%d') AS ds
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "date_funcs2" ->
      """SELECT o_orderkey,
        |       quarter(o_orderdate) AS qtr,
        |       dayofweek(o_orderdate) + 1 AS dow,
        |       week(o_orderdate) AS iso_week,
        |       CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
        |       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "cond_exprs" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |            WHEN o_totalprice > 150000.0 THEN 'mid'
        |            ELSE 'small' END AS size_band,
        |       CASE WHEN o_orderstatus = 'F' THEN 'final' ELSE 'open' END AS status_word,
        |       nullif(o_orderstatus, 'P') AS status_or_null,
        |       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
        |       round(greatest(o_totalprice, 100000.0), 4) AS floor_price,
        |       round(least(o_totalprice, 400000.0), 4) AS capped_price
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "math_funcs" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       round(abs(l_discount - 0.05), 4) AS abs_d,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |       round(sqrt(l_extendedprice), 4) AS sqrt_price,
        |       round(pow(l_quantity, 1.5), 4) AS qty_pow,
        |       l_orderkey % 7 AS mod7,
        |       round(ln(l_extendedprice), 4) AS ln_price
        |FROM lineitem
        |WHERE l_orderkey % 10 = 0
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    "array_funcs" ->
      """SELECT vec_id,
        |       len(embedding) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        |       round(CAST(embedding[-1] AS DOUBLE), 4) AS last_val,
        |       round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
        |       round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_val,
        |       round(list_sum(CAST(embedding[1:8] AS DOUBLE[])), 4) AS sum_first8
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "array_explode" ->
      """SELECT vec_id, pos, round(CAST(val AS DOUBLE), 4) AS val
        |FROM (
        |  SELECT vec_id,
        |         generate_subscripts(embedding, 1) - 1 AS pos,
        |         unnest(embedding) AS val
        |  FROM embeddings
        |)
        |WHERE pos < 8
        |ORDER BY vec_id, pos""".stripMargin,

    "array_funcs2" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding[1:6],
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 10) AS BIGINT)) AS a,
        |         list_transform(embedding[5:10],
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 10) AS BIGINT)) AS b
        |  FROM embeddings
        |)
        |SELECT vec_id,
        |       coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS a_union,
        |       coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |         x -> list_contains(b, x))), ','), '') AS a_intersect,
        |       coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |         x -> NOT list_contains(b, x))), ','), '') AS a_except,
        |       coalesce(array_to_string(list_concat(a, b), ','), '') AS a_flat,
        |       round(CAST(list_sum(a) + list_sum(b) AS DOUBLE), 4) AS zip_sum
        |FROM q
        |ORDER BY vec_id""".stripMargin,

    "map_funcs" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click')    AS clicks,
        |       count(*) FILTER (event_type = 'view')     AS views,
        |       count(*) FILTER (event_type = 'purchase') AS purchases,
        |       count(DISTINCT event_type) AS n_types
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "json_funcs" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_schema
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |       count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY ws, event_type
        |ORDER BY ws, event_type""".stripMargin,

    "stream_sliding" ->
      """SELECT ws, ws + INTERVAL '1 hour' AS we, event_type,
        |       count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - (k * INTERVAL '15 minutes') AS ws,
        |         event_type, value
        |  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) t(k)
        |)
        |GROUP BY ws, event_type
        |ORDER BY ws, event_type""".stripMargin,

    "stream_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked
        |)
        |SELECT user_id,
        |       min(ts) AS session_start,
        |       max(ts) + INTERVAL '30 minutes' AS session_end,
        |       count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // The hash input is the canonical normalizer (text_normalize):
    // DuckDB's strip_accents∘nfc_normalize is utf8proc NFD+STRIPMARK —
    // the same fold as the Spark expression, applied in the same
    // order (marks stripped BEFORE lower).
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id,
        |       sha256(trim(regexp_replace(
        |         lower(strip_accents(nfc_normalize(text))),
        |         '\s+', ' ', 'g'))) AS h,
        |       count(*) AS n_copies
        |FROM documents
        |GROUP BY 2
        |ORDER BY doc_id""".stripMargin,

    // dedup_near contracts the SAME output as dedup_ngram (exact J>=0.8
    // pairs) — banded-MinHash candidate generation (16 bands x 2 rows)
    // is a pure optimization that only skips pairs with escape
    // probability (1-J^2)^16 <= 8e-8, zero on this corpus.
    "dedup_near" -> dedupPairsOracle,
    "dedup_ngram" -> dedupPairsOracle,

    // SimHash with an md5 bit source (r12: closes the r10/r11 oracle
    // question — xxhash64 has no DuckDB equivalent, md5 does). Bit b of
    // a shingle's vote = hex nibble b/4 of md5(s), shifted by b%4.
    // Fingerprint assembled as UBIGINT (same bit pattern as Spark's
    // signed long; only shift-mask/xor/bit_count read it). The 4x16-bit
    // band join is replayed verbatim — pigeonhole makes it lossless for
    // Hamming <= 3, so this is the exact output, not an approximation.
    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
        |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
        |  WHERE len(w) >= 5
        |), votes AS (
        |  SELECT doc_id, b,
        |         sum(CASE WHEN ((strpos('0123456789abcdef',
        |                          substr(md5(s), (b // 4) + 1, 1)) - 1)
        |                        >> (b % 4)) & 1 = 1
        |             THEN 1 ELSE -1 END) AS v
        |  FROM sh, LATERAL unnest(generate_series(0, 63)) tb(b)
        |  GROUP BY doc_id, b
        |), fp AS (
        |  SELECT doc_id,
        |         sum(CASE WHEN v > 0 THEN (1::HUGEINT << b)
        |             ELSE 0::HUGEINT END)::UBIGINT AS f
        |  FROM votes GROUP BY doc_id
        |), banded AS (
        |  SELECT doc_id, f, band, (f >> (16 * band)) & 65535 AS bv
        |  FROM fp, LATERAL unnest(generate_series(0, 3)) t(band)
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.f AS fa, b.f AS fb
        |  FROM banded a
        |  JOIN banded b ON a.band = b.band AND a.bv = b.bv
        |               AND a.doc_id < b.doc_id
        |)
        |SELECT doc_a, doc_b, bit_count(xor(fa, fb))::BIGINT AS hamming
        |FROM pairs
        |WHERE bit_count(xor(fa, fb)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Batch-vs-corpus incremental dedup: both flags replay as EXISTS
    // against the corpus half (same shingle CTE as the pairs oracle,
    // restricted to cross-set joins).
    "dedup_incremental" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
        |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
        |  WHERE len(w) >= 5
        |), cnt AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), hashes AS (
        |  SELECT doc_id, sha256(trim(regexp_replace(
        |           lower(strip_accents(nfc_normalize(text))),
        |           '\s+', ' ', 'g'))) AS h
        |  FROM documents
        |), bexact AS (
        |  SELECT DISTINCT b.doc_id
        |  FROM hashes b JOIN hashes c ON b.h = c.h
        |  WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |  GROUP BY 1, 2
        |), bnear AS (
        |  SELECT DISTINCT doc_a AS doc_id
        |  FROM inter
        |  JOIN cnt na ON doc_a = na.doc_id
        |  JOIN cnt nb ON doc_b = nb.doc_id
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
        |)
        |SELECT d.doc_id,
        |       CASE WHEN e.doc_id IS NULL THEN 0 ELSE 1 END AS exact_dup,
        |       CASE WHEN n.doc_id IS NULL THEN 0 ELSE 1 END AS near_dup,
        |       CASE WHEN e.doc_id IS NULL AND n.doc_id IS NULL
        |            THEN 1 ELSE 0 END AS kept
        |FROM documents d
        |LEFT JOIN bexact e ON d.doc_id = e.doc_id
        |LEFT JOIN bnear  n ON d.doc_id = n.doc_id
        |WHERE d.doc_id % 10 = 0
        |ORDER BY d.doc_id""".stripMargin,

    // Quantized-shortlist + exact-rerank: codes replay the proven
    // embed_quantize formulation; both rank keys round to 4 dp before
    // ranking with cand_id ties (the sim_topk convention), so shortlist
    // boundary and final cut are deterministic cross-engine.
    "sim_pq" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |), sc AS (
        |  SELECT vec_id, max(abs(v)) AS scale FROM e GROUP BY vec_id
        |), q AS (
        |  SELECT e.vec_id, e.pos,
        |         CASE WHEN sc.scale = 0 THEN 0
        |              ELSE CAST(round(e.v / sc.scale * 127) AS BIGINT)
        |         END AS qv
        |  FROM e JOIN sc ON e.vec_id = sc.vec_id
        |), nrm AS (
        |  SELECT vec_id, sqrt(sum(v * v)) AS n FROM e GROUP BY vec_id
        |), qn AS (
        |  SELECT vec_id, sqrt(sum(qv * qv)) AS qn FROM q GROUP BY vec_id
        |), short AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |         round(sum(p.v * c.qv) / (np.n * qn.qn), 4) AS qscore
        |  FROM e p
        |  JOIN q c ON p.pos = c.pos
        |  JOIN qn ON c.vec_id = qn.vec_id
        |  JOIN nrm np ON p.vec_id = np.vec_id
        |  WHERE p.vec_id < 10 AND p.vec_id <> c.vec_id
        |  GROUP BY 1, 2, qn.qn, np.n
        |), top100 AS (
        |  SELECT probe_id, cand_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY probe_id
        |                                 ORDER BY qscore DESC, cand_id) AS srn
        |    FROM short
        |  ) WHERE srn <= 100
        |), dots AS (
        |  SELECT t.probe_id, t.cand_id, sum(p.v * c.v) AS dot
        |  FROM top100 t
        |  JOIN e p ON p.vec_id = t.probe_id
        |  JOIN e c ON c.vec_id = t.cand_id AND c.pos = p.pos
        |  GROUP BY 1, 2
        |), cos AS (
        |  SELECT probe_id, cand_id,
        |         round(dot / (np.n * nc.n), 4) AS cosine
        |  FROM dots
        |  JOIN nrm np ON probe_id = np.vec_id
        |  JOIN nrm nc ON cand_id = nc.vec_id
        |)
        |SELECT probe_id, cand_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY probe_id
        |                               ORDER BY cosine DESC, cand_id) AS rn
        |  FROM cos
        |) WHERE rn <= 10
        |ORDER BY probe_id, cand_id""".stripMargin,

    "sim_topk" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(sum(v*v)) AS n FROM e GROUP BY vec_id
        |), dots AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, sum(p.v * c.v) AS dot
        |  FROM e p JOIN e c ON p.pos = c.pos
        |  WHERE p.vec_id < 10 AND p.vec_id <> c.vec_id
        |  GROUP BY 1, 2
        |), cos AS (
        |  SELECT probe_id, cand_id,
        |         round(dot / (np.n * nc.n), 4) AS cosine
        |  FROM dots
        |  JOIN nrm np ON probe_id = np.vec_id
        |  JOIN nrm nc ON cand_id = nc.vec_id
        |)
        |SELECT probe_id, cand_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY probe_id
        |                               ORDER BY cosine DESC, cand_id) AS rn
        |  FROM cos
        |) WHERE rn <= 10
        |ORDER BY probe_id, cand_id""".stripMargin,

    // filtered search: the sim_topk replay with the label predicate
    // composed INTO the candidate join (pre-filter semantics — a
    // post-filtered global top-k would underfill and hash-mismatch)
    "sim_filtered" ->
      """WITH e AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(sum(v*v)) AS n FROM e GROUP BY vec_id
        |), dots AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |         c.label AS label, sum(p.v * c.v) AS dot
        |  FROM e p JOIN e c ON p.pos = c.pos AND p.label = c.label
        |  WHERE p.vec_id < 10 AND p.vec_id <> c.vec_id
        |  GROUP BY 1, 2, 3
        |), cos AS (
        |  SELECT probe_id, cand_id, label,
        |         round(dot / (np.n * nc.n), 4) AS cosine
        |  FROM dots
        |  JOIN nrm np ON probe_id = np.vec_id
        |  JOIN nrm nc ON cand_id = nc.vec_id
        |)
        |SELECT probe_id, cand_id, label, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY probe_id
        |                               ORDER BY cosine DESC, cand_id) AS rn
        |  FROM cos
        |) WHERE rn <= 10
        |ORDER BY probe_id, cand_id""".stripMargin,

    // per-row list aggregates replay Spark's sequential HOF folds;
    // n2 rounds to 4 dp BEFORE the threshold/min/max in BOTH engines
    "dq_embedding" ->
      """WITH per AS (
        |  SELECT label,
        |    len(embedding) AS dim,
        |    len(list_filter(embedding,
        |        x -> isnan(CAST(x AS DOUBLE)))) > 0 AS has_nan,
        |    len(list_filter(embedding, x -> x <> 0)) = 0 AS all_zero,
        |    round(list_sum(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS n2
        |  FROM embeddings
        |)
        |SELECT label,
        |  count(*) AS n_vectors,
        |  CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bad_dim,
        |  CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nan,
        |  CAST(sum(CASE WHEN all_zero THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero,
        |  CAST(sum(CASE WHEN abs(n2 - 1.0) > 0.01 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_off_unit,
        |  min(n2) AS min_norm2,
        |  max(n2) AS max_norm2
        |FROM per GROUP BY label ORDER BY label""".stripMargin,

    "dedup_embedding" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(sum(v*v)) AS n FROM e GROUP BY vec_id
        |), pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v * b.v) AS dot
        |  FROM e a JOIN e b ON a.pos = b.pos AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2
        |)
        |SELECT vec_a, vec_b, cosine FROM (
        |  SELECT vec_a, vec_b,
        |         round(dot / (na.n * nb.n), 4) AS cosine
        |  FROM pairs
        |  JOIN nrm na ON vec_a = na.vec_id
        |  JOIN nrm nb ON vec_b = nb.vec_id
        |)
        |WHERE cosine >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,

    "multimodal_frames" ->
      """SELECT doc_id, frame_idx,
        |       md5(substr(text, CAST(frame_idx * 32 + 1 AS INT), 32)) AS frame_md5
        |FROM (
        |  SELECT doc_id, text,
        |         unnest(generate_series(0,
        |           greatest(CAST(ceil(length(text) / 32.0) AS BIGINT) - 1, 0),
        |           4)) AS frame_idx
        |  FROM documents
        |)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |       count(DISTINCT source) AS n_sources,
        |       CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS total_tokens,
        |       round(avg(len(string_split_regex(trim(lower(text)), '\s+'))), 4) AS avg_tokens,
        |       round(avg(n_chars), 4) AS avg_chars,
        |       min(n_chars) AS min_chars,
        |       max(n_chars) AS max_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "token_count" ->
      """SELECT doc_id,
        |       len(string_split_regex(trim(lower(text)), '\s+')) AS ws_tokens,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
        |       length(text) AS len_chars,
        |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_llm_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |         string_split_regex(trim(lower(text)), '\s+') AS w,
        |         length(regexp_replace(text, '[^a-z0-9]', '', 'g')) AS alnum
        |  FROM documents
        |)
        |SELECT doc_id,
        |       length(text) AS len_chars,
        |       len(w) AS n_tokens,
        |       round(alnum * 1.0 / length(text), 4) AS alnum_ratio,
        |       round(alnum * 1.0 / len(w), 4) AS avg_token_len,
        |       round(len(list_filter(w, t -> t IN ('the', 'a', 'of'))) * 1.0 / len(w), 4) AS stop_ratio,
        |       round(least(1.0, len(w) / 100.0) *
        |             (1.0 - len(list_filter(w, t -> t IN ('the', 'a', 'of'))) * 1.0 / len(w)), 4) AS quality_score
        |FROM q
        |ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |         len(regexp_extract_all(text, 'the')) + len(regexp_extract_all(text, 'and'))
        |       + len(regexp_extract_all(text, 'ing')) + len(regexp_extract_all(text, 'ion')) AS score_en,
        |         len(regexp_extract_all(text, 'der')) + len(regexp_extract_all(text, 'die'))
        |       + len(regexp_extract_all(text, 'und')) + len(regexp_extract_all(text, 'sch')) AS score_de,
        |         len(regexp_extract_all(text, 'les')) + len(regexp_extract_all(text, 'que'))
        |       + len(regexp_extract_all(text, 'ent')) + len(regexp_extract_all(text, 'eau')) AS score_fr,
        |         len(regexp_extract_all(text, 'los')) + len(regexp_extract_all(text, 'las'))
        |       + len(regexp_extract_all(text, 'cion')) + len(regexp_extract_all(text, 'que')) AS score_es,
        |         len(regexp_extract_all(text, 'de ')) + len(regexp_extract_all(text, 'shi'))
        |       + len(regexp_extract_all(text, 'zhong')) + len(regexp_extract_all(text, 'wen')) AS score_zh
        |  FROM documents
        |)
        |SELECT doc_id, lang,
        |       CASE WHEN score_en >= score_de AND score_en >= score_fr
        |                 AND score_en >= score_es AND score_en >= score_zh THEN 'en'
        |            WHEN score_de >= score_fr AND score_de >= score_es
        |                 AND score_de >= score_zh THEN 'de'
        |            WHEN score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
        |            WHEN score_es >= score_zh THEN 'es'
        |            ELSE 'zh' END AS pred_lang,
        |       score_en, score_de, score_fr, score_es, score_zh
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
        |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
        |  WHERE len(w) >= 5
        |), sk AS (
        |  SELECT doc_id, count(*) AS n_shingles,
        |         array_to_string(list_sort(list(md5(s)))[1:4], '|') AS sketch
        |  FROM sh GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       md5(lower(trim(d.text))) AS doc_md5,
        |       coalesce(sk.n_shingles, 0) AS n_shingles,
        |       coalesce(sk.sketch, '') AS sketch
        |FROM documents d LEFT JOIN sk ON d.doc_id = sk.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "sql_udf" ->
      """WITH t AS (
        |  SELECT CASE WHEN l_quantity < 10 THEN 'low'
        |              WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END
        |           AS tier,
        |         l_returnflag,
        |         count(*) AS n,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                             * 100) AS BIGINT)) AS BIGINT)
        |           AS net_cents
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT tier, l_returnflag, n, net_cents,
        |       CAST(h AS BIGINT) AS half,
        |       CASE WHEN h = 0 THEN net_cents // 2
        |            ELSE net_cents - net_cents // 2 END AS part_cents
        |FROM t, (SELECT unnest([0, 1]) AS h)
        |ORDER BY tier, l_returnflag, half""".stripMargin,

    "udf_suite" ->
      """WITH t AS (
        |  SELECT lang, n_chars,
        |         len(string_split_regex(trim(lower(text)), '\s+')) AS toks
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_docs,
        |       round(exp(avg(ln(n_chars))), 4) AS geo_chars,
        |       CAST(sum(toks) AS BIGINT) AS total_tokens,
        |       CAST(sum(CASE WHEN toks >= 2 THEN toks - 1 ELSE 0 END) AS BIGINT) AS n_bigrams
        |FROM t
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id,
        |       octet_length(encode(text)) AS blob_len,
        |       sha256(text) AS sha,
        |       lower(hex(encode(substr(text, 1, 4)))) AS header_hex
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // The oracle replays the header ARITHMETIC (the fields are md5-hex
    // functions of doc_id); Spark earns the same numbers by round-
    // tripping real container bytes through the pure-JVM parser — a
    // decoder bug (offset, endianness, CRC) breaks the hash. The CASE
    // ladder mirrors the malformation classes: %17 truncation kills
    // every format, %23 CRC poisoning kills ONLY PNG (f=0; BMP/WAV
    // carry no checksum), and WAV has no width/height by nature.
    "multimodal_decode" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         md5('mm:' || doc_id) AS hx,
        |         least(octet_length(encode(text)), 24) AS plen
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, plen,
        |         doc_id % 3 AS f,
        |         doc_id % 17 = 0 AS trunc,
        |         doc_id % 23 = 0 AND doc_id % 3 = 0 AS badcrc,
        |         16 + CAST('0x' || substring(hx, 1, 6) AS BIGINT) % 1000 AS w,
        |         16 + CAST('0x' || substring(hx, 7, 6) AS BIGINT) % 800 AS ht,
        |         CAST('0x' || substring(hx, 13, 2) AS BIGINT) % 2 AS bit
        |  FROM h
        |)
        |SELECT doc_id,
        |       CASE WHEN trunc OR badcrc THEN NULL
        |            WHEN f = 0 THEN 'png' WHEN f = 1 THEN 'bmp'
        |            ELSE 'wav' END AS format,
        |       CASE WHEN trunc OR badcrc OR f = 2 THEN NULL
        |            ELSE w END AS width,
        |       CASE WHEN trunc OR badcrc OR f = 2 THEN NULL
        |            ELSE ht END AS height,
        |       CASE WHEN trunc OR badcrc THEN NULL
        |            WHEN f = 0 THEN 8 WHEN f = 1 THEN 24
        |            ELSE 16 END AS depth,
        |       CASE WHEN trunc OR badcrc THEN NULL
        |            WHEN f = 0 THEN 3 + bit WHEN f = 1 THEN 3
        |            ELSE 1 + bit END AS channels,
        |       CASE WHEN trunc THEN 6
        |            WHEN f = 0 THEN 33
        |            WHEN f = 1 THEN 54 + plen
        |            ELSE 44 + plen END AS blob_len
        |FROM p
        |ORDER BY doc_id""".stripMargin,

    // The text-format scans round-trip the projection through CSV/JSONL
    // losslessly, so the oracle is simply the same projection over the
    // original parquet — a green hash proves the whole codec path.
    "scan_csv" ->
      """SELECT c_custkey, c_nationkey, c_name, c_acctbal
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "scan_jsonl" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // Deterministic synthetic-PII injection (same expression both
    // engines), then the same redaction patterns; md5 of the scrubbed
    // text compares exact content.
    "text_pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id || '@example.com or +1-555-' ||
        |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |       md5(regexp_replace(regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |           '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
        |FROM aug
        |ORDER BY doc_id""".stripMargin,

    "seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tok,
        |         sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT doc_id, lang, n_tok,
        |       CAST((cum - n_tok) // 2048 AS BIGINT) AS bin_id,
        |       CAST((cum - n_tok) % 2048 AS BIGINT) AS bin_off
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    // Two-key argmax replayed as a window rank (longer text wins,
    // length ties break toward the smaller doc_id) — order-tuple, not
    // arithmetic packing, so it matches Spark's struct max_by at any
    // doc_id magnitude.
    "dedup_keep_best" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |         sha256(trim(regexp_replace(
        |           lower(strip_accents(nfc_normalize(text))),
        |           '\s+', ' ', 'g'))) AS h
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, h, n_chars,
        |         row_number() OVER (PARTITION BY h
        |           ORDER BY n_chars DESC, doc_id ASC) AS rn,
        |         count(*) OVER (PARTITION BY h) AS n_copies,
        |         max(n_chars) OVER (PARTITION BY h) AS kept_chars
        |  FROM d
        |)
        |SELECT doc_id AS kept_doc, h, kept_chars,
        |       CAST(n_copies AS BIGINT) AS n_copies
        |FROM r WHERE rn = 1
        |ORDER BY kept_doc""".stripMargin,

    "corpus_hist" ->
      """SELECT least(n_chars // 50, 9) AS bucket,
        |       count(*) AS n_docs,
        |       min(n_chars) AS min_chars,
        |       max(n_chars) AS max_chars,
        |       round(avg(n_chars), 4) AS avg_chars
        |FROM documents
        |GROUP BY bucket
        |ORDER BY bucket""".stripMargin,

    "corpus_sample" ->
      """SELECT doc_id, lang, n_chars, rn
        |FROM (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents
        |)
        |WHERE rn % 10 = 1
        |ORDER BY doc_id""".stripMargin,

    // Greedy packing is a capacity-reset fold — sequential per
    // (lang, shard) — replayed in SQL as a recursive CTE walking each
    // group in rn order with (bin, fill) as the carried state.
    "seq_pack_greedy" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, lang, doc_id // 1000 AS shard,
        |         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok,
        |         row_number() OVER (PARTITION BY lang, doc_id // 1000
        |                            ORDER BY doc_id) AS rn
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, lang, shard, n_tok, rn,
        |         CAST(0 AS BIGINT) AS bin_id, n_tok AS fill
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.doc_id, t.lang, t.shard, t.n_tok, t.rn,
        |         CASE WHEN r.fill + t.n_tok > 2048 AND r.fill > 0
        |              THEN r.bin_id + 1 ELSE r.bin_id END,
        |         CASE WHEN r.fill + t.n_tok > 2048 AND r.fill > 0
        |              THEN t.n_tok ELSE r.fill + t.n_tok END
        |  FROM r JOIN t ON t.lang = r.lang AND t.shard = r.shard
        |              AND t.rn = r.rn + 1
        |)
        |SELECT doc_id, lang, shard, n_tok, bin_id
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         round(tf.tf * ln(n.n_docs * 1.0 / df.df), 4) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, term, tf, tfidf,
        |       CAST(row_number() OVER (PARTITION BY doc_id
        |         ORDER BY tfidf DESC, term) AS INT) AS rk
        |FROM scored
        |QUALIFY rk <= 5
        |ORDER BY doc_id, rk""".stripMargin,

    // Flag thresholds compare the ROUNDED metrics so both engines
    // branch identically at the boundary.
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok,
        |         generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos
        |  FROM documents
        |), tc AS (
        |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
        |), ts AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
        |         count(*) AS n_distinct, max(c) AS top_c
        |  FROM tc GROUP BY 1
        |), bg AS (
        |  SELECT doc_id,
        |         tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
        |  FROM toks QUALIFY b IS NOT NULL
        |), bc AS (
        |  SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2
        |), bs AS (
        |  SELECT doc_id, sum(c) AS n_bg,
        |         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_bg
        |  FROM bc GROUP BY 1
        |), m AS (
        |  SELECT ts.doc_id, ts.n_tok, ts.n_distinct,
        |         round(ts.n_distinct * 1.0 / ts.n_tok, 4) AS distinct_ratio,
        |         round(ts.top_c * 1.0 / ts.n_tok, 4) AS top_tok_frac,
        |         round(coalesce(bs.dup_bg, 0) * 1.0 / coalesce(bs.n_bg, 1), 4)
        |           AS dup_bigram_frac
        |  FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
        |)
        |SELECT *, CAST(top_tok_frac >= 0.15 OR dup_bigram_frac >= 0.1 AS INT)
        |         AS repetitive
        |FROM m ORDER BY doc_id""".stripMargin,

    "decontam_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
        |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
        |  WHERE len(w) >= 5
        |), ev AS (
        |  SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
        |), m AS (
        |  SELECT sh.doc_id, count(*) AS n_shingles,
        |         CAST(count(ev.s) AS BIGINT) AS n_hit,
        |         round(count(ev.s) * 1.0 / count(*), 4) AS overlap_frac
        |  FROM sh LEFT JOIN ev ON sh.s = ev.s
        |  WHERE sh.doc_id % 97 <> 0
        |  GROUP BY 1
        |)
        |SELECT *, CAST(overlap_frac >= 0.5 AS INT) AS contaminated
        |FROM m ORDER BY doc_id""".stripMargin,

    // Argmax on the 4-dp ROUNDED cosine with centroid-id tiebreak —
    // both engines pick identically even at a rounding boundary.
    "embed_cluster" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(sum(v*v)) AS n FROM e GROUP BY vec_id
        |), dots AS (
        |  SELECT a.vec_id, c.vec_id AS cid, sum(a.v * c.v) AS dot
        |  FROM e a JOIN e c ON a.pos = c.pos
        |  WHERE c.vec_id < 8
        |  GROUP BY 1, 2
        |), cos AS (
        |  SELECT d.vec_id, CAST(d.cid AS INT) AS cid,
        |         round(dot / (na.n * nc.n), 4) AS c
        |  FROM dots d
        |  JOIN nrm na ON d.vec_id = na.vec_id
        |  JOIN nrm nc ON d.cid = nc.vec_id
        |)
        |SELECT vec_id, cid AS cluster_id, c AS cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                               ORDER BY c DESC, cid) AS rn
        |  FROM cos
        |) WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,

    // Transitive closure of the SAME exact J >= 0.8 pair set the
    // dedup_near/dedup_ngram oracle contracts; min reachable id =
    // component label.
    "dedup_components" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
        |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
        |  WHERE len(w) >= 5
        |), cnt AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN cnt na ON doc_a = na.doc_id
        |  JOIN cnt nb ON doc_b = nb.doc_id
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
        |), edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs
        |), reach AS (
        |  SELECT u AS node, u AS r FROM edges
        |  UNION
        |  SELECT e.u AS node, reach.r FROM edges e JOIN reach ON e.v = reach.node
        |), comp AS (
        |  SELECT node, min(r) AS component FROM reach GROUP BY node
        |), sizes AS (
        |  SELECT component, count(*) AS n_members FROM comp GROUP BY component
        |)
        |SELECT c.node AS doc_id, c.component, s.n_members,
        |       CAST(c.node = c.component AS INT) AS is_canonical
        |FROM comp c JOIN sizes s USING (component)
        |ORDER BY doc_id""".stripMargin,

    "funnel_conversion" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
        |)
        |SELECT u.user_id,
        |       CAST(v.user_id IS NOT NULL AS INT)
        |     + CAST(c.user_id IS NOT NULL AS INT)
        |     + CAST(p.user_id IS NOT NULL AS INT) AS stage
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN v USING (user_id)
        |LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "retention_cohort" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |), cohorts AS (
        |  SELECT user_id, min(d) AS cohort FROM days GROUP BY 1
        |)
        |SELECT c.cohort,
        |       CAST(date_diff('day', c.cohort, d.d) AS INT) AS day_offset,
        |       count(*) AS n_active
        |FROM days d JOIN cohorts c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // z rounded to 4 dp BEFORE the threshold in both engines, so a
    // boundary event is admitted (or not) identically.
    "anomaly_zscore" ->
      """WITH s AS (
        |  SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd,
        |         count(*) AS n
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_id, e.user_id, e.event_type, e.value,
        |       round((e.value - s.mu) / s.sd, 4) AS z
        |FROM events e JOIN s USING (user_id)
        |WHERE s.n >= 2 AND s.sd > 0
        |  AND abs(round((e.value - s.mu) / s.sd, 4)) >= 2.5
        |ORDER BY e.event_id""".stripMargin,

    "graph_pagerank" -> pagerankOracle,

    "graph_communities" ->
      """WITH ebase AS MATERIALIZED (
        |  SELECT least(user_id, prev) AS a, greatest(user_id, prev) AS b,
        |         count(*) AS w
        |  FROM (
        |    SELECT user_id,
        |           lag(user_id) OVER (PARTITION BY event_type,
        |                              date_trunc('day', ts)
        |                              ORDER BY ts, event_id) AS prev
        |    FROM events
        |  )
        |  WHERE prev IS NOT NULL AND prev <> user_id
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 2
        |), edges AS MATERIALIZED (
        |  SELECT a AS u, b AS v, w FROM ebase
        |  UNION ALL
        |  SELECT b AS u, a AS v, w FROM ebase
        |), l0 AS MATERIALIZED (
        |  SELECT DISTINCT u AS node, u AS label FROM edges
        |), l1 AS MATERIALIZED (
        |  SELECT u AS node, label FROM (
        |    SELECT e.u, l.label, sum(e.w) AS sw,
        |           row_number() OVER (PARTITION BY e.u
        |                              ORDER BY sum(e.w) DESC, l.label) AS rn
        |    FROM edges e JOIN l0 l ON l.node = e.v GROUP BY e.u, l.label
        |  ) WHERE rn = 1
        |), l2 AS MATERIALIZED (
        |  SELECT u AS node, label FROM (
        |    SELECT e.u, l.label, sum(e.w) AS sw,
        |           row_number() OVER (PARTITION BY e.u
        |                              ORDER BY sum(e.w) DESC, l.label) AS rn
        |    FROM edges e JOIN l1 l ON l.node = e.v GROUP BY e.u, l.label
        |  ) WHERE rn = 1
        |), l3 AS MATERIALIZED (
        |  SELECT u AS node, label FROM (
        |    SELECT e.u, l.label, sum(e.w) AS sw,
        |           row_number() OVER (PARTITION BY e.u
        |                              ORDER BY sum(e.w) DESC, l.label) AS rn
        |    FROM edges e JOIN l2 l ON l.node = e.v GROUP BY e.u, l.label
        |  ) WHERE rn = 1
        |), l4 AS MATERIALIZED (
        |  SELECT u AS node, label FROM (
        |    SELECT e.u, l.label, sum(e.w) AS sw,
        |           row_number() OVER (PARTITION BY e.u
        |                              ORDER BY sum(e.w) DESC, l.label) AS rn
        |    FROM edges e JOIN l3 l ON l.node = e.v GROUP BY e.u, l.label
        |  ) WHERE rn = 1
        |)
        |SELECT l4.node AS user_id, l4.label AS community, s.comm_size
        |FROM l4 JOIN (
        |  SELECT label, count(*) AS comm_size FROM l4 GROUP BY 1
        |) s USING (label)
        |ORDER BY l4.node""".stripMargin,

    // binaryFile raw-file ingest: the files hold exactly the UTF-8
    // text bytes keyed by doc_id, so the oracle replays identity,
    // octet length and sha-256 over the original parquet — a green
    // hash certifies write → listing → binary read → blob integrity.
    "scan_binary" ->
      """SELECT doc_id,
        |       octet_length(encode(text)) AS blob_len,
        |       sha256(text) AS sha
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // Lossless columnar round-trip ⇒ the oracle replays projection +
    // filter over the original parquet.
    "scan_orc" ->
      """SELECT s_suppkey, s_nationkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_acctbal > 0
        |ORDER BY s_suppkey""".stripMargin,

    // Lossless binary row-format round-trip ⇒ the oracle replays
    // projection + filter over the original parquet.
    "scan_avro" ->
      """SELECT c_custkey, c_nationkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_acctbal > 0
        |ORDER BY c_custkey""".stripMargin,

    // Schema evolution (mergeSchema union): the batch split is a pure
    // key expression, so the oracle replays it — rows from the old
    // batch (even keys, written without the column) surface
    // p_retailprice as NULL in BOTH engines.
    "scan_evolving" ->
      """SELECT p_partkey, p_name,
        |       CASE WHEN p_partkey % 2 = 1 THEN p_retailprice END
        |         AS p_retailprice
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    // Dynamic partition pruning: the oracle replays the star join over
    // the original parquet (partition-column int round-trips losslessly
    // through the directory name).
    "scan_dpp" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_nationkey, n_name
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |ORDER BY o_orderkey""".stripMargin,

    // Partition-pruned scan: the oracle replays projection + year
    // predicate over the original parquet (the partition column
    // round-trips losslessly through the directory name).
    "scan_partitioned" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       CAST(year(o_orderdate) AS INTEGER) AS o_year
        |FROM orders
        |WHERE year(o_orderdate) = 1998
        |ORDER BY o_orderkey""".stripMargin,

    "seq_shuffle" ->
      """WITH ranked AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INT)
        |           AS bucket
        |  FROM documents
        |), rk AS (
        |  SELECT doc_id, bucket,
        |         row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rk
        |  FROM ranked
        |), offs AS (
        |  SELECT bucket,
        |         CAST(coalesce(sum(n) OVER (ORDER BY bucket
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |           AS off
        |  FROM (SELECT bucket, count(*) AS n FROM rk GROUP BY 1)
        |)
        |SELECT r.doc_id, r.bucket, o.off + r.rk - 1 AS pos
        |FROM rk r JOIN offs o USING (bucket)
        |ORDER BY r.doc_id""".stripMargin,

    // α=0.5 temperature mix; the rate formula is written in the SAME
    // operation order as the Spark side and round(·,6)-pinned, and the
    // hash-Bernoulli keep uses the first 24 md5 bits of doc_id — both
    // engines draw the identical uniform, so the kept set is exact.
    // Boundary safety (measured): min |u − rate| ≥ 1.2e-4 at every sf,
    // ~10 orders above any cross-engine pow() ulp drift on the rate.
    "corpus_mix" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS n_docs, pow(count(*), 0.5) AS w
        |  FROM documents GROUP BY lang
        |), tot AS (
        |  SELECT sum(w) AS wsum, CAST(sum(n_docs) AS BIGINT) AS n_total
        |  FROM counts
        |), rates AS (
        |  SELECT lang,
        |         round(least(1.0, w / wsum * n_total * 0.5 / n_docs), 6)
        |           AS rate
        |  FROM counts, tot
        |)
        |SELECT d.doc_id, d.lang, r.rate
        |FROM documents d JOIN rates r USING (lang)
        |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) AS INT)
        |        / 16777216.0 < r.rate
        |ORDER BY d.doc_id""".stripMargin,

    // Bucketing is a pure layout property — the oracle is the plain
    // join over the original parquet (a green hash proves the bucketed
    // write+read round-trip AND the join result).
    "join_bucketed" ->
      """SELECT o_orderkey, o_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // Span-hash inverted index replayed with the same tokenization and
    // the same md5-over-20-token-window; the window index i is cast to
    // INTEGER to match Spark's posexplode position type.
    "dedup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), sp AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |         md5(array_to_string(w[i:i+19], ' ')) AS h
        |  FROM toks, LATERAL unnest(generate_series(1, len(w) - 19)) t(i)
        |  WHERE len(w) >= 20
        |), agg AS (
        |  SELECT h, count(*) AS n_occ,
        |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM sp GROUP BY h
        |), first AS (
        |  SELECT h, doc_id AS first_doc, pos AS first_pos FROM (
        |    SELECT h, doc_id, pos,
        |           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        |    FROM sp) WHERE rn = 1
        |)
        |SELECT a.h, a.n_occ, a.n_docs, f.first_doc, f.first_pos
        |FROM agg a JOIN first f USING (h)
        |WHERE a.n_docs >= 2
        |ORDER BY a.h""".stripMargin,

    // The five-stage corpus pipeline replayed end-to-end: exact dedup →
    // recursive-CTE near-dup closure (the dedup_components oracle,
    // restricted to exact-dedup survivors) → two-key canonical argmax →
    // length gate → running-bin packing. A green hash certifies the
    // COMPOSITION of the already-verified stages.
    "pipeline_corpus" ->
      """WITH RECURSIVE surv AS (
        |  SELECT min(doc_id) AS doc_id FROM documents
        |  GROUP BY sha256(trim(regexp_replace(
        |    lower(strip_accents(nfc_normalize(text))), '\s+', ' ', 'g')))
        |), d AS (
        |  SELECT doc.* FROM documents doc JOIN surv USING (doc_id)
        |), toks AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM d
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
        |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
        |  WHERE len(w) >= 5
        |), cnt AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN cnt na ON doc_a = na.doc_id
        |  JOIN cnt nb ON doc_b = nb.doc_id
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
        |), edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs
        |), reach AS (
        |  SELECT u AS node, u AS r FROM edges
        |  UNION
        |  SELECT e.u AS node, reach.r FROM edges e JOIN reach ON e.v = reach.node
        |), comp AS (
        |  SELECT node, min(r) AS grp FROM reach GROUP BY node
        |), labeled AS (
        |  SELECT d.doc_id, coalesce(c.grp, d.doc_id) AS grp, d.lang,
        |         d.n_chars, d.text
        |  FROM d LEFT JOIN comp c ON d.doc_id = c.node
        |), canon AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (PARTITION BY grp
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn
        |    FROM labeled) WHERE rn = 1
        |), kept AS (
        |  SELECT * FROM (
        |    SELECT l.doc_id, l.lang,
        |           CAST(len(string_split_regex(trim(lower(l.text)), '\s+')) AS BIGINT)
        |             AS n_tok
        |    FROM labeled l JOIN canon USING (doc_id))
        |  WHERE n_tok >= 10
        |), packed AS (
        |  SELECT doc_id, lang, n_tok,
        |         sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM kept
        |)
        |SELECT doc_id, lang, n_tok,
        |       CAST((cum - n_tok) // 2048 AS BIGINT) AS bin_id,
        |       CAST((cum - n_tok) % 2048 AS BIGINT) AS bin_off
        |FROM packed
        |ORDER BY doc_id""".stripMargin,

    // Last-writer-wins compaction replayed as a window rank; the
    // tombstone filter applies to each key's LATEST record only.
    "cdc_upsert" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, ts AS last_ts, event_id AS last_event,
        |       event_type AS last_type, round(value, 4) AS last_value
        |FROM r WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // The bloom filter is correctness-neutral plan surgery — the oracle
    // is the plain join (same contract style as join_salted).
    "join_bloom" ->
      """SELECT year(l_shipdate) AS ship_year,
        |       count(*) AS n_rows,
        |       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |                  AS DOUBLE) / 100, 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1
        |ORDER BY ship_year""".stripMargin,

    "doc_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, w, len(w) AS n,
        |         CASE WHEN len(w) <= 32 THEN 1
        |              ELSE CAST(ceil((len(w) - 32) / 24.0) AS BIGINT) + 1
        |         END AS n_chunks
        |  FROM t
        |), x AS (
        |  SELECT doc_id, w, n, unnest(range(0, n_chunks)) AS k FROM c
        |)
        |SELECT doc_id, k AS chunk_id,
        |       CAST(least(32, n - k*24) AS BIGINT) AS n_chunk_tokens,
        |       array_to_string(w[k*24 + 1 : k*24 + 32], ' ') AS chunk_text
        |FROM x
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // Integer-exact code aggregates; x/scale*127 is the identical
    // left-to-right double expression in both engines (no summation
    // reassociation), so round() picks the same int8 code.
    "embed_pca_power" ->
      """WITH q AS MATERIALIZED (
        |  SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
        |  FROM embeddings
        |), nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM q
        |), su AS MATERIALIZED (
        |  SELECT i, CAST(sum(v) AS HUGEINT) AS s FROM (
        |    SELECT generate_subscripts(q, 1) AS i, unnest(q) AS v FROM q)
        |  GROUP BY 1
        |), pp AS MATERIALIZED (
        |  SELECT e.s['i'] AS i, e.s['j'] AS j, CAST(sum(e.s['p']) AS HUGEINT) AS sp
        |  FROM (
        |    SELECT unnest(flatten(list_transform(range(1, 65), i ->
        |      list_transform(range(i, 65), j ->
        |        {'i': i, 'j': j, 'p': q[i] * q[j]})))) AS s
        |    FROM q) e
        |  GROUP BY 1, 2
        |), cfull AS MATERIALIZED (
        |  SELECT p.i, p.j, nn.n * p.sp - si.s * sj.s AS c
        |  FROM (SELECT i, j, sp FROM pp
        |        UNION ALL
        |        SELECT j AS i, i AS j, sp FROM pp WHERE i <> j) p, nn
        |  JOIN su si ON si.i = p.i
        |  JOIN su sj ON sj.i = p.j
        |), v0 AS (
        |  SELECT CAST(t.range AS BIGINT) AS i, CAST(1 AS HUGEINT) AS v
        |  FROM range(1, 65) t
        |), mv1 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v0 v ON v.i = c.j GROUP BY 1
        |), v1 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv1) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv1), mv2 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v1 v ON v.i = c.j GROUP BY 1
        |), v2 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv2) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv2), mv3 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v2 v ON v.i = c.j GROUP BY 1
        |), v3 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv3) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv3), mv4 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v3 v ON v.i = c.j GROUP BY 1
        |), v4 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv4) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv4), mv5 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v4 v ON v.i = c.j GROUP BY 1
        |), v5 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv5) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv5), mv6 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v5 v ON v.i = c.j GROUP BY 1
        |), v6 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv6) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv6), mv7 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v6 v ON v.i = c.j GROUP BY 1
        |), v7 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv7) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv7), mv8 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v7 v ON v.i = c.j GROUP BY 1
        |), v8 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv8) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv8), mv9 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v8 v ON v.i = c.j GROUP BY 1
        |), v9 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv9) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv9), mv10 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v9 v ON v.i = c.j GROUP BY 1
        |), v10 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv10) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv10), mv11 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v10 v ON v.i = c.j GROUP BY 1
        |), v11 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv11) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv11), mv12 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v11 v ON v.i = c.j GROUP BY 1
        |), v12 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv12) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv12), mv13 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v12 v ON v.i = c.j GROUP BY 1
        |), v13 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv13) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv13), mv14 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v13 v ON v.i = c.j GROUP BY 1
        |), v14 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv14) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv14), mv15 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v14 v ON v.i = c.j GROUP BY 1
        |), v15 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv15) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv15), mv16 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v15 v ON v.i = c.j GROUP BY 1
        |), v16 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv16) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv16), mv17 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v16 v ON v.i = c.j GROUP BY 1
        |), v17 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv17) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv17), mv18 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v17 v ON v.i = c.j GROUP BY 1
        |), v18 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv18) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv18), mv19 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v18 v ON v.i = c.j GROUP BY 1
        |), v19 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv19) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv19), mv20 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v19 v ON v.i = c.j GROUP BY 1
        |), v20 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv20) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv20), mv21 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v20 v ON v.i = c.j GROUP BY 1
        |), v21 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv21) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv21), mv22 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v21 v ON v.i = c.j GROUP BY 1
        |), v22 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv22) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv22), mv23 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v22 v ON v.i = c.j GROUP BY 1
        |), v23 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv23) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv23), mv24 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v23 v ON v.i = c.j GROUP BY 1
        |), v24 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv24) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv24), mv25 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v24 v ON v.i = c.j GROUP BY 1
        |), v25 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv25) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv25), mv26 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v25 v ON v.i = c.j GROUP BY 1
        |), v26 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv26) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv26), mv27 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v26 v ON v.i = c.j GROUP BY 1
        |), v27 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv27) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv27), mv28 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v27 v ON v.i = c.j GROUP BY 1
        |), v28 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv28) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv28), mv29 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v28 v ON v.i = c.j GROUP BY 1
        |), v29 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv29) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv29), mv30 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v29 v ON v.i = c.j GROUP BY 1
        |), v30 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv30) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv30), mv31 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v30 v ON v.i = c.j GROUP BY 1
        |), v31 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv31) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv31), mv32 AS MATERIALIZED (
        |  SELECT c.i, sum(c.c * v.v) AS mv
        |  FROM cfull c JOIN v31 v ON v.i = c.j GROUP BY 1
        |), v32 AS MATERIALIZED (
        |  SELECT i, mv // greatest(CAST(1 AS HUGEINT),
        |    (SELECT max(abs(mv)) FROM mv32) // CAST(1048576 AS HUGEINT)) AS v
        |  FROM mv32
        |), sgn AS (
        |  SELECT CASE WHEN v >= 0 THEN 1 ELSE -1 END AS sg
        |  FROM v32 ORDER BY abs(v) DESC, i LIMIT 1
        |), nrm AS (
        |  SELECT sqrt(CAST((SELECT sum(v * v) FROM v32) AS DOUBLE)) AS norm
        |)
        |SELECT CAST(v32.i AS INT) AS dim,
        |       CAST(floor(1e6 * sgn.sg * CAST(v32.v AS DOUBLE) / nrm.norm) AS BIGINT)
        |         AS loading_micro
        |FROM v32, sgn, nrm
        |ORDER BY dim""".stripMargin,

    "embed_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding,
        |           v -> abs(CAST(v AS DOUBLE)))) AS scale
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id, scale,
        |         list_transform(embedding,
        |           v -> CASE WHEN scale = 0 THEN 0
        |                     ELSE CAST(round(CAST(v AS DOUBLE) / scale * 127)
        |                               AS INTEGER) END) AS q
        |  FROM s
        |)
        |SELECT vec_id, round(scale, 4) AS scale_r,
        |       CAST(len(q) AS BIGINT) AS n_dims,
        |       CAST(list_sum(q) AS BIGINT) AS q_sum,
        |       list_min(q) AS q_min,
        |       list_max(q) AS q_max
        |FROM q
        |ORDER BY vec_id""".stripMargin,

    // Bitmaps are exact: both columns must equal count(DISTINCT).
    "agg_bitmap_distinct" ->
      """SELECT event_type,
        |       count(DISTINCT user_id) AS n_users,
        |       count(DISTINCT user_id) AS n_users_rollup
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // Compaction must be lossless: identity replay over the original.
    "compact_files" ->
      """SELECT doc_id, lang, n_chars, md5(text) AS text_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "scd2_history" ->
      """WITH ch AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), f AS (
        |  SELECT user_id, ts, event_id, event_type FROM ch
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |)
        |SELECT user_id, event_id, event_type AS status, ts AS valid_from,
        |       coalesce(lead(ts) OVER
        |                  (PARTITION BY user_id ORDER BY ts, event_id),
        |                TIMESTAMP '2100-01-01 00:00:00') AS valid_to,
        |       CAST(lead(ts) OVER
        |              (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |            AS INTEGER) AS is_current
        |FROM f
        |ORDER BY user_id, valid_from, event_id""".stripMargin,

    // Point-in-time join: the dimension CTE is scd2_history's oracle
    // compacted to (user, status, valid_from, valid_to); intervals
    // partition each user's timeline so the join is exactly 1:1.
    "join_temporal" ->
      """WITH ch AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), f AS (
        |  SELECT user_id, ts, event_id, event_type FROM ch
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |), dim AS (
        |  SELECT user_id, event_type AS status, ts AS valid_from,
        |         coalesce(lead(ts) OVER
        |                    (PARTITION BY user_id ORDER BY ts, event_id),
        |                  TIMESTAMP '2100-01-01 00:00:00') AS valid_to
        |  FROM f
        |)
        |SELECT e.user_id, e.ts, e.event_id, d.status
        |FROM events e
        |JOIN dim d ON e.user_id = d.user_id
        |          AND e.ts >= d.valid_from AND e.ts < d.valid_to
        |ORDER BY e.user_id, e.ts, e.event_id""".stripMargin,

    // Sessionization: all time arithmetic in integer microseconds
    // (epoch_us ↔ unix_micros) so gap compares and durations are exact
    // in both engines.
    "sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |), f AS (
        |  SELECT user_id, event_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), g AS (
        |  SELECT user_id, ts_us,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS session_id
        |  FROM f
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       count(*) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us,
        |       max(ts_us) - min(ts_us) AS duration_us
        |FROM g
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "vocab_topk" ->
      """SELECT token, count(*) AS n_occurrences
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |        AS token
        |      FROM documents)
        |GROUP BY token
        |ORDER BY n_occurrences DESC, token
        |LIMIT 100""".stripMargin,

    // The streaming file-sink run must emit EXACTLY the batch window
    // aggregation (same oracle shape as stream_tumbling): a green hash
    // proves no window was lost in state and the sink committed each
    // batch exactly once.
    "stream_sink_files" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |       count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY ws, event_type
        |ORDER BY ws, event_type""".stripMargin,

    // Sorted layout is correctness-neutral: the oracle is the plain
    // range filter over the original table.
    "layout_sorted" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       l_extendedprice, CAST(l_shipdate AS DATE) AS ship_d
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    // Z-order box read: layout is correctness-neutral, so the oracle
    // replays the plain box filter. The cut points are sf-relative —
    // both engines compute lo + floor(span/4) with exact arithmetic
    // (span·0.25 is exact in a double at key magnitudes, and the Spark
    // side uses integer division), so the literals agree.
    "layout_zorder" ->
      """WITH b AS (
        |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
        |         min(l_suppkey) AS smin, max(l_suppkey) AS smax
        |  FROM lineitem
        |)
        |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       l_extendedprice
        |FROM lineitem, b
        |WHERE l_partkey >= pmin + CAST(FLOOR((pmax - pmin) / 4.0) AS BIGINT)
        |  AND l_partkey <  pmin + CAST(FLOOR((pmax - pmin) / 2.0) AS BIGINT)
        |  AND l_suppkey >= smin + CAST(FLOOR((smax - smin) / 4.0) AS BIGINT)
        |  AND l_suppkey <  smin + CAST(FLOOR((smax - smin) / 2.0) AS BIGINT)
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    // Gap fill: silent hours must appear as explicit zero rows.
    // All-integer surface: exact BIGINT hourly sums; trend/seasonal are
    // floor(double-division of exactly-representable ints) — floor,
    // not integer div, because detrended sums go negative and Spark's
    // div truncates where // floors.
    "ts_decompose" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type,
        |         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |           AS v_milli
        |  FROM events GROUP BY 1, 2
        |), tr AS (
        |  SELECT h, event_type, v_milli,
        |         CAST(floor(
        |           CAST(sum(v_milli) OVER w AS DOUBLE) /
        |           count(*) OVER w) AS BIGINT) AS trend_milli
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h
        |               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
        |), se AS (
        |  SELECT h, event_type, v_milli, trend_milli,
        |         v_milli - trend_milli AS d,
        |         CAST(floor(
        |           CAST(sum(v_milli - trend_milli) OVER s AS DOUBLE) /
        |           count(*) OVER s) AS BIGINT) AS seas_milli
        |  FROM tr
        |  WINDOW s AS (PARTITION BY event_type, hour(h))
        |)
        |SELECT h, event_type, v_milli, trend_milli, seas_milli,
        |       d - seas_milli AS resid_milli
        |FROM se
        |ORDER BY event_type, h""".stripMargin,

    // The oracle is the flat slice replay: a green hash certifies the
    // zstd write/read round-trip is lossless; size ordering across
    // codecs is SourcesSpec's physical pin.
    "write_codecs" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       l_returnflag, l_linestatus, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_orderkey % 4 = 0
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    "ts_resample" ->
      """WITH ev AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, value FROM events
        |), agg AS (
        |  SELECT h, event_type, count(*) AS n,
        |         round(sum(value), 4) AS sum_value
        |  FROM ev GROUP BY h, event_type
        |), b AS (
        |  SELECT min(h) AS h0, max(h) AS h1 FROM ev
        |), grid AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b
        |), ty AS (
        |  SELECT DISTINCT event_type FROM ev
        |)
        |SELECT g.h, ty.event_type,
        |       coalesce(a.n, 0) AS n,
        |       coalesce(a.sum_value, 0.0) AS sum_value
        |FROM grid g
        |CROSS JOIN ty
        |LEFT JOIN agg a ON a.h = g.h AND a.event_type = ty.event_type
        |ORDER BY g.h, ty.event_type""".stripMargin,

    // XML round-trip must be lossless: projection replay over the
    // original parquet (same contract as scan_csv / scan_jsonl).
    "scan_xml" ->
      """SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    // Full outer: sentinel-coalesced keys + a null_rank class column
    // (0 matched / 1 left-only / 2 right-only) make the sort total in
    // both engines regardless of NULL placement.
    "join_full_outer" ->
      """SELECT coalesce(c_custkey, -1) AS cust,
        |       coalesce(o_orderkey, -1) AS order_key,
        |       CASE WHEN c_custkey IS NULL THEN 2
        |            WHEN o_orderkey IS NULL THEN 1
        |            ELSE 0 END AS null_rank,
        |       coalesce(o_totalprice, 0.0) AS price
        |FROM (SELECT c_custkey, c_name FROM customer
        |      WHERE c_mktsegment = 'AUTOMOBILE') c
        |FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice
        |                 FROM orders WHERE o_totalprice > 350000.0) o
        |  ON c_custkey = o_custkey
        |ORDER BY null_rank, cust, order_key""".stripMargin,

    // Identical correlated-subquery text on both engines: DuckDB
    // executes its own decorrelation, Spark runs
    // RewriteCorrelatedScalarSubquery + semi-join — a green hash
    // certifies the rewrites agree. Exact-integer-cents arithmetic
    // throughout (see Relational.subqueryCorrelated): no float
    // rounding exists in the output, so the Spark-vs-DuckDB round()
    // half-boundary divergence cannot occur.
    "subquery_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       cents - CAST(floor(avg_cents) AS BIGINT)
        |         AS delta_vs_cust_avg_cents
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         (SELECT avg(CAST(round(o2.o_totalprice * 100) AS BIGINT))
        |          FROM orders o2
        |          WHERE o2.o_custkey = o.o_custkey) AS avg_cents
        |  FROM orders o
        |  WHERE EXISTS (SELECT 1 FROM customer c
        |                WHERE c.c_custkey = o.o_custkey
        |                  AND c.c_acctbal > 0.0)
        |) sub WHERE cents > 1.5 * avg_cents
        |ORDER BY o_orderkey""".stripMargin,

    // RANGE frame bounds by ts VALUE distance (integer microseconds,
    // the sessionize_batch convention): tie order cannot change the
    // frame, so no tiebreak column is needed in the window itself.
    "win_range_frames" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
        |  FROM events
        |)
        |SELECT user_id, ts_us, event_id,
        |       count(*) OVER w AS n_1h,
        |       round(sum(value) OVER w, 4) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    // DuckDB's strip_accents∘nfc_normalize is utf8proc NFD+STRIPMARK —
    // byte-identical to the Spark text_normalize expression's fold
    // (marks stripped before lower; canonical forms only, no NFKC).
    "text_normalize" ->
      """SELECT doc_id,
        |       trim(regexp_replace(
        |         lower(strip_accents(nfc_normalize(text))),
        |         '\s+', ' ', 'g')) AS norm_text,
        |       sha256(trim(regexp_replace(
        |         lower(strip_accents(nfc_normalize(text))),
        |         '\s+', ' ', 'g'))) AS norm_hash,
        |       length(trim(regexp_replace(
        |         lower(strip_accents(nfc_normalize(text))),
        |         '\s+', ' ', 'g'))) AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // The oracle replays EXACT per-day counts: CMS cells are exact
    // sums over seed-fixed hash positions, and at |types|=5 vs
    // width=2000·depth=7 the min-over-depth estimate provably equals
    // the true count (no candidate collides in all rows) — verified
    // est == exact on this corpus. The skew-stressed approximation
    // behavior is pinned separately in EventAnalyticsSpec.
    "agg_approx_topk" ->
      """WITH c AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |         count(*) AS est_count
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT day, event_type, est_count,
        |         row_number() OVER (PARTITION BY day
        |           ORDER BY est_count DESC, event_type) AS rk
        |  FROM c
        |)
        |SELECT day, rk, event_type, est_count
        |FROM r WHERE rk <= 3
        |ORDER BY day, rk""".stripMargin,

    // Melt column names come out as the literal source column names in
    // both engines; all four measures are parquet doubles so the melted
    // value column is DOUBLE on both sides with no decimal promotion.
    // NULL asymmetry: DuckDB UNPIVOT EXCLUDES null values by default
    // while Spark Dataset.unpivot KEEPS them — safe here only because
    // all four measures are non-null by the parquet schema; a nullable
    // measure would need INCLUDE NULLS (or a WHERE value IS NOT NULL
    // guard on both sides) to keep row counts aligned.
    "unpivot_melt" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, measure, value
        |FROM (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |             l_quantity, l_extendedprice, l_discount, l_tax
        |      FROM lineitem WHERE l_orderkey % 50 = 0)
        |UNPIVOT (value FOR measure IN
        |  (l_quantity, l_extendedprice, l_discount, l_tax))
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber, measure""".stripMargin,

    // The oracle replays the SAME explicit two-stage tie-break (count
    // desc, value asc) — native mode() documents arbitrary tie order in
    // both engines and is therefore not hash-gateable.
    "agg_mode" ->
      """WITH c AS (
        |  SELECT c_mktsegment, o_orderpriority, count(*) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT c_mktsegment, o_orderpriority, n,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |           ORDER BY n DESC, o_orderpriority) AS rn
        |  FROM c
        |)
        |SELECT c_mktsegment, o_orderpriority AS mode_priority, n
        |FROM r WHERE rn = 1
        |ORDER BY c_mktsegment""".stripMargin,

    // DuckDB supports count(DISTINCT) OVER natively; Spark does not, so
    // the engine side is size(collect_set() OVER) — semantically equal.
    // The frame sort is (ts, event_id): event_id makes it total, so the
    // ROWS frame contents are identical in both engines.
    "win_distinct_count" ->
      """SELECT event_id, user_id,
        |       count(DISTINCT event_type) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |         AS distinct_types_10,
        |       count(DISTINCT event_type) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS distinct_types_cum
        |FROM events
        |WHERE user_id % 20 = 0
        |ORDER BY event_id""".stripMargin,

    // The oracle replays the naive form: canonical u<v edges, each
    // triangle {a<b<c} matched exactly once as (a,b)(b,c)(a,c); total
    // wedges Σ d(d−1)/2 off the degree table. The Spark side's
    // degree-oriented join is a pure execution strategy — same counts.
    "graph_triangles" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey % 10 = 0
        |), e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |), deg AS (
        |  SELECT x, count(*) AS d FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v FROM e
        |  ) GROUP BY x
        |), tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM e ab JOIN e bc ON ab.v = bc.u
        |            JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
        |)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
        |       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |       (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg)
        |         AS n_wedges,
        |       CAST(n_triangles AS BIGINT) AS n_triangles,
        |       round(3.0 * n_triangles /
        |         (SELECT sum(d * (d - 1) / 2) FROM deg), 4) AS clustering
        |FROM tri""".stripMargin,

    // Same spine as ts_resample's oracle; neighbor lookup replays the
    // identical IGNORE NULLS window pair. Rounding-free by design:
    // exact integer cents + epoch-hour indexes, half-up via
    // floor((2·num + den)/(2·den)) — the one double division's
    // quotient sits ≥ 1/(2·den) from any integer when fractional, so
    // the floor is exact in both engines (see the Spark-side note).
    "ts_interpolate" ->
      """WITH obs AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type,
        |         CAST(round(sum(value) * 100) AS BIGINT) AS c_obs
        |  FROM events GROUP BY 1, 2
        |), grid AS (
        |  SELECT unnest(generate_series(
        |    (SELECT min(h) FROM obs), (SELECT max(h) FROM obs),
        |    INTERVAL 1 HOUR)) AS h
        |), spine AS (
        |  SELECT g.h, t.event_type
        |  FROM grid g CROSS JOIN (SELECT DISTINCT event_type FROM obs) t
        |), j AS (
        |  SELECT s.h, s.event_type, o.c_obs,
        |         CAST(epoch(s.h) AS BIGINT) // 3600 AS hx
        |  FROM spine s LEFT JOIN obs o
        |    ON s.h = o.h AND s.event_type = o.event_type
        |), n AS (
        |  SELECT h, event_type, c_obs, hx,
        |         last_value(c_obs IGNORE NULLS) OVER (
        |           PARTITION BY event_type ORDER BY h
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |         last_value(CASE WHEN c_obs IS NOT NULL THEN hx END
        |           IGNORE NULLS) OVER (
        |           PARTITION BY event_type ORDER BY h
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |         first_value(c_obs IGNORE NULLS) OVER (
        |           PARTITION BY event_type ORDER BY h
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |         first_value(CASE WHEN c_obs IS NOT NULL THEN hx END
        |           IGNORE NULLS) OVER (
        |           PARTITION BY event_type ORDER BY h
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j
        |)
        |SELECT h, event_type,
        |       CASE WHEN c_obs IS NOT NULL THEN CAST(1 AS BIGINT)
        |            ELSE CAST(0 AS BIGINT) END AS observed,
        |       CAST(CASE
        |         WHEN c_obs IS NOT NULL THEN c_obs
        |         WHEN pv IS NULL THEN nv
        |         WHEN nv IS NULL THEN pv
        |         ELSE CAST(floor(
        |           (2 * (pv * (nh - hx) + nv * (hx - ph)) + (nh - ph))
        |           / (2.0 * (nh - ph))) AS BIGINT)
        |       END AS BIGINT) AS value_cents
        |FROM n
        |ORDER BY h, event_type""".stripMargin,

    // Identical FILTER-clause SQL (DuckDB supports SQL:2003 FILTER
    // natively). No filtered AVG by design — see the Spark-side
    // boundary note; counts/sums/extremes are grid-safe.
    "agg_filtered" ->
      """SELECT o_orderpriority,
        |       count(*) AS n_all,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |       count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
        |       round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'),
        |             4) AS sum_open,
        |       round(max(o_totalprice) FILTER (WHERE o_orderstatus = 'F'),
        |             4) AS max_finished
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Identical GROUPING SETS replay — both engines truncate weeks to
    // Monday and run the same grouping() disambiguation.
    "rollup_time_grain" ->
      """WITH e AS (
        |  SELECT date_trunc('day', ts)   AS d,
        |         date_trunc('week', ts)  AS w,
        |         date_trunc('month', ts) AS m,
        |         value
        |  FROM events
        |)
        |SELECT CASE WHEN grouping(d) = 0 THEN 'day'
        |            WHEN grouping(w) = 0 THEN 'week'
        |            ELSE 'month' END AS grain,
        |       coalesce(d, w, m) AS grain_start,
        |       count(*) AS n,
        |       round(sum(value), 4) AS sum_value
        |FROM e
        |GROUP BY GROUPING SETS ((d), (w), (m))
        |ORDER BY grain, grain_start""".stripMargin,

    // Char stream replayed positionally (substr over generate_series —
    // code-point semantics on both sides for this corpus); the same
    // log2(N) − Σ n·log2(n)/N algebraic form keeps the operation
    // sequence identical.
    "text_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS c
        |  FROM documents,
        |       LATERAL unnest(generate_series(1, length(text))) t(i)
        |), cnt AS (
        |  SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |       CAST(sum(n) AS BIGINT) AS n_chars,
        |       round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 4)
        |         AS entropy_bits
        |FROM cnt
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Identical explicit-edge floor binning on both sides; bin ids and
    // edges are exact (integer floor of double arithmetic over 2-dp
    // inputs), min/max are order-independent.
    "agg_hist" ->
      """SELECT o_orderpriority,
        |       CAST(floor((o_totalprice - 0.0) / 50000.0) AS BIGINT)
        |         AS bin,
        |       round(0.0 + floor((o_totalprice - 0.0) / 50000.0)
        |         * 50000.0, 4) AS bin_lo,
        |       count(*) AS n,
        |       round(min(o_totalprice), 4) AS bin_min,
        |       round(max(o_totalprice), 4) AS bin_max
        |FROM orders
        |GROUP BY 1, 2, 3
        |ORDER BY o_orderpriority, bin""".stripMargin,

    // Both sides sort INSIDE the aggregate (array_sort / ORDER BY n_name)
    // because native listagg element order is engine-arbitrary.
    "agg_listagg" ->
      """SELECT c_mktsegment,
        |       string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
        |       count(DISTINCT n_name) AS n_nations
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "agg_bitwise" ->
      """SELECT o_orderpriority,
        |       bit_and(o_orderkey % 4096) AS mask_and,
        |       bit_or(o_orderkey % 4096)  AS mask_or,
        |       bit_xor(o_orderkey % 4096) AS mask_xor,
        |       count(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // DuckDB spells the modifier inside the call: f(args IGNORE NULLS).
    // The running last_value frame is explicit on both sides; lag uses
    // the implicit (-1,-1) offset frame on both sides.
    "win_ignore_nulls" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |         CASE WHEN event_type = 'purchase' THEN value END
        |           AS purchase_value
        |  FROM events WHERE user_id % 20 = 0
        |)
        |SELECT event_id, user_id,
        |       round(coalesce(last_value(purchase_value IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 4)
        |         AS last_purchase,
        |       round(coalesce(lag(purchase_value, 1 IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id), 0.0), 4)
        |         AS prev_purchase
        |FROM e
        |ORDER BY event_id""".stripMargin,

    "join_lateral" ->
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |WHERE c.c_custkey % 10 = 0
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin,

    // keep flag compares the ROUNDED ppl so both engines branch
    // identically at the threshold
    "text_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents
        |), counts AS (
        |  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        |), tot AS (
        |  SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM counts
        |), lm AS (
        |  SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT 16
        |), scored AS (
        |  SELECT toks.doc_id,
        |         coalesce(ln(CAST(lm.cnt AS DOUBLE) / tot.t),
        |                  ln(1.0 / tot.t)) AS lp
        |  FROM toks LEFT JOIN lm USING (tok) CROSS JOIN tot
        |)
        |SELECT doc_id, count(*) AS n_toks,
        |       round(exp(-avg(lp)), 4) AS ppl,
        |       CASE WHEN round(exp(-avg(lp)), 4) <= 600.0
        |            THEN 1 ELSE 0 END AS keep
        |FROM scored GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // recursive-CTE BFS with UNION (distinct) recursion — (node, d)
    // rows dedup per level, so the working set is bounded by 5·|V|,
    // never the path-enumeration blowup of UNION ALL; min(d) over the
    // ≤4-hop levels is the BFS distance, matching the frontier loop's
    // settled-at-first-visit construction.
    "graph_shortest_path" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_orderkey % 10 = 0
        |), e0 AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |), edges AS (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
        |), bfs AS (
        |  SELECT DISTINCT u AS node, 0 AS d FROM edges WHERE u % 97 = 0
        |  UNION
        |  SELECT e.v, bfs.d + 1 FROM bfs JOIN edges e ON bfs.node = e.u
        |  WHERE bfs.d < 4
        |)
        |SELECT node, min(d) AS hops FROM bfs GROUP BY node
        |ORDER BY node""".stripMargin,

    // the ±1 hyperplane matrix re-derives from md5 parity in BOTH
    // engines — identical sign expression; x quantized ONCE to exact
    // BIGINT micro-units so the per-(vec,j) sums are order-independent
    // integer arithmetic (sum CAST back from DuckDB's HUGEINT)
    "embed_rp" ->
      """WITH ex AS (
        |  SELECT vec_id, t.i - 1 AS i,
        |         CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000)
        |              AS BIGINT) AS xm
        |  FROM embeddings,
        |       LATERAL unnest(generate_series(1, len(embedding))) t(i)
        |), grid AS (
        |  SELECT vec_id, i, xm, g.j
        |  FROM ex, LATERAL unnest(generate_series(0, 7)) g(j)
        |)
        |SELECT vec_id, j,
        |       CAST(sum(CASE WHEN instr('13579bdf', substring(md5(
        |         concat(CAST(i AS VARCHAR), ':', CAST(j AS VARCHAR))), 1, 1))
        |         > 0 THEN -1 ELSE 1 END * xm) AS BIGINT) AS y_micro8
        |FROM grid GROUP BY vec_id, j
        |ORDER BY vec_id, j""".stripMargin,

    // v_schema is schema_of_variant's inferred type string — constant
    // for this fixture's uniform {"k": <int>} props (verified live);
    // nil_is_null pins VARIANT's explicit-JSON-null vs SQL-null split
    "json_variant" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       'OBJECT<k: BIGINT>' AS v_schema,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS arr_1,
        |       event_type AS meta_t,
        |       true AS nil_is_null
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "pipeline_observe" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_in,
        |       CAST(sum(n_chars) AS BIGINT) AS chars_in,
        |       CAST(count(*) FILTER (WHERE n_chars >= 200) AS BIGINT)
        |         AS n_kept,
        |       CAST(sum(n_chars) FILTER (WHERE n_chars >= 200) AS BIGINT)
        |         AS chars_kept,
        |       round((count(*) FILTER (WHERE n_chars >= 200)) * 1.0
        |         / count(*), 4) AS kept_ratio
        |FROM documents""".stripMargin,

    // the URL is constructed from event columns, so the oracle
    // recomputes every parsed field from the same base columns — same
    // values, no SQL re-implementation of the parser
    "url_funcs" ->
      """SELECT event_id,
        |       'https' AS proto,
        |       event_type || '.example.com' AS host,
        |       '/d/' || CAST(event_id % 50 AS VARCHAR) || '/page' AS path,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS q_param,
        |       'a b/c' AS t_decoded,
        |       's' || CAST(event_id % 7 AS VARCHAR) AS fragment,
        |       'example' AS domain
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // DuckDB has no collations — the oracle replays the SEMANTICS with
    // explicit lower() folds (exactly the materialization the collated
    // type avoids engine-side)
    "str_collation" ->
      """WITH m AS (
        |  SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
        |              ELSE p_type END AS messy
        |  FROM part
        |)
        |SELECT lower(messy) AS p_type_folded,
        |       count(*) AS n_parts,
        |       count(DISTINCT messy) AS n_case_variants,
        |       count(*) FILTER (WHERE upper(messy) LIKE 'PROMO%')
        |         AS n_promo
        |FROM m
        |GROUP BY lower(messy)
        |ORDER BY p_type_folded""".stripMargin,

    // identical NOT IN SQL — DuckDB applies the same three-valued
    // logic, so the poisoned variant is 0 in both engines
    "join_null_aware" ->
      """SELECT 'clean' AS variant, count(*) AS n_orders
        |FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer
        |   WHERE c_mktsegment = 'BUILDING')
        |UNION ALL
        |SELECT 'poisoned' AS variant, count(*) AS n_orders
        |FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL
        |               ELSE c_custkey END
        |   FROM customer
        |   WHERE c_mktsegment = 'BUILDING' OR c_custkey % 100 = 0)
        |ORDER BY variant""".stripMargin,

    // the text round trip re-reads what it wrote; the oracle re-derives
    // the escaped TSV payload from the documents table directly (DuckDB
    // standard strings do no backslash processing — '\t' is 2 chars)
    "scan_text" ->
      """SELECT doc_id, lang,
        |       replace(replace(text, chr(9), '\t'), chr(10), '\n')
        |         AS text_esc
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // the two-level prefix sum must equal the flat global row_number
    "id_assign" ->
      """SELECT doc_id, lang,
        |       row_number() OVER (ORDER BY lang, doc_id) AS global_id
        |FROM documents
        |ORDER BY global_id""".stripMargin,

    // merged table after the click-partition revision: click rows carry
    // the doubled value, every other partition the original
    "write_partition_overwrite" ->
      """SELECT event_id, event_type, user_id,
        |       CASE WHEN event_type = 'click'
        |            THEN round(round(value, 4) * 2, 4)
        |            ELSE round(value, 4) END AS value
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // exact in the uncompressed-sketch regime (group N < accuracy 1e5
    // at every driver SF): GK returns the exact discrete order
    // statistic, which quantile_disc replays — the agg_approx_topk
    // provable-exactness argument applied to quantiles
    "agg_approx_percentile" ->
      """SELECT o_orderpriority,
        |       round(quantile_disc(o_totalprice, 0.25), 4) AS p25,
        |       round(quantile_disc(o_totalprice, 0.5),  4) AS p50,
        |       round(quantile_disc(o_totalprice, 0.9),  4) AS p90
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // DuckDB's levenshtein is byte-identical to Spark's (probed incl.
    // the empty-string edge); same blocking, orientation and cutoff
    "str_edit_distance" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name,
        |         split_part(p_name, ' ', 2) AS block
        |  FROM part
        |)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM names a JOIN names b
        |  ON a.block = b.block AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY name_a, name_b""".stripMargin,

    // medians replay via exact quantile_cont (= Spark percentile);
    // the outlier comparison is unrounded with left-associated
    // identical constants — bit-equal IEEE arithmetic in both engines
    "anomaly_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type
        |), mad AS (
        |  SELECT e.event_type, any_value(m.med) AS med,
        |         quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m USING (event_type)
        |  GROUP BY e.event_type
        |)
        |SELECT e.event_type,
        |       round(any_value(m.med), 4) AS med,
        |       round(any_value(m.mad), 4) AS mad,
        |       count(*) AS n,
        |       count(*) FILTER (
        |         WHERE abs(e.value - m.med) > 3 * 1.4826 * m.mad)
        |         AS n_outliers
        |FROM events e JOIN mad m USING (event_type)
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin,

    // the rn-difference island label is internal in both engines; the
    // output keys on first_event
    "win_islands" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         row_number() OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id)
        |         - row_number() OVER
        |           (PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |           AS island
        |  FROM events WHERE user_id % 20 = 0
        |)
        |SELECT user_id, event_type,
        |       min(event_id) AS first_event,
        |       max(event_id) AS last_event,
        |       count(*) AS run_len
        |FROM e
        |GROUP BY user_id, event_type, island
        |HAVING count(*) >= 2
        |ORDER BY user_id, first_event""".stripMargin,

    // v2 derives deterministically from the same base table; typed
    // column comparison, no row-hash formatting
    "table_diff" ->
      """WITH v1 AS (
        |  SELECT event_id, event_type, round(value, 4) AS value
        |  FROM events
        |), v2 AS (
        |  SELECT event_id, event_type,
        |         CASE WHEN event_type = 'click' THEN round(value * 2, 4)
        |              ELSE value END AS value
        |  FROM v1 WHERE event_id % 97 <> 0
        |  UNION ALL
        |  SELECT event_id + 1000000, event_type, value
        |  FROM v1 WHERE event_id % 101 = 0
        |)
        |SELECT CASE WHEN v1.event_id IS NULL THEN 'added'
        |            WHEN v2.event_id IS NULL THEN 'removed'
        |            WHEN v1.event_type <> v2.event_type
        |                 OR v1.value <> v2.value THEN 'changed'
        |            ELSE 'same' END AS status,
        |       count(*) AS n,
        |       min(coalesce(v1.event_id, v2.event_id)) AS min_key,
        |       max(coalesce(v1.event_id, v2.event_id)) AS max_key
        |FROM v1 FULL OUTER JOIN v2 USING (event_id)
        |GROUP BY 1
        |ORDER BY status""".stripMargin,

    // the oracle recomputes the refreshed aggregate FLAT from raw
    // events — merged partial states must equal the full recompute
    // (integer milli-units make the equality exact)
    "agg_incremental_merge" ->
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |         AS sum_milli,
        |       round(sum(CAST(round(value * 1000) AS BIGINT)) / 1000.0
        |             / count(*), 4) AS avg_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // each try_* NULL replayed with an explicit CASE guard — DuckDB's
    // non-ANSI semantics made explicit
    "ansi_try_funcs" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_custkey % 7 = 0 THEN NULL
        |            ELSE round(o_totalprice / (o_custkey % 7), 4) END
        |         AS per_bucket,
        |       TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'x'
        |            ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT)
        |         AS parsed,
        |       CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |            ELSE CAST(o_orderdate AS DATE) END AS parsed_date,
        |       CASE WHEN o_custkey % 2 = 1 THEN NULL
        |            ELSE 9223372036854775807 END AS near_max
        |FROM orders
        |WHERE o_orderkey % 20 = 0
        |ORDER BY o_orderkey""".stripMargin,

    // the oracle inlines the bound values as literals — a green hash
    // proves parameter binding is semantically invisible
    "sql_params" ->
      """SELECT o_orderkey, o_orderpriority,
        |       round(o_totalprice * 1.07, 4) AS taxed,
        |       'hi' AS bucket
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT'
        |  AND o_totalprice > 150000.0
        |  AND o_orderkey % 10 = 0
        |ORDER BY o_orderkey""".stripMargin,

    // the transposed summary replayed as conditional aggregation — one
    // UNION ALL branch per metric row, one CASE column per priority
    "table_transpose" ->
      """WITH m AS (
        |  SELECT o_orderpriority AS p,
        |         CAST(count(*) AS DOUBLE) AS n_orders,
        |         round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                    AS DOUBLE) / 100, 4) AS total_price,
        |         round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                    AS DOUBLE) / 100 / count(*), 4) AS avg_price
        |  FROM orders GROUP BY o_orderpriority
        |)
        |SELECT 'avg_price' AS metric,
        |       max(CASE WHEN p = '1-URGENT' THEN avg_price END) AS "1-URGENT",
        |       max(CASE WHEN p = '2-HIGH' THEN avg_price END) AS "2-HIGH",
        |       max(CASE WHEN p = '3-MEDIUM' THEN avg_price END) AS "3-MEDIUM",
        |       max(CASE WHEN p = '4-NOT SPECIFIED' THEN avg_price END) AS "4-NOT SPECIFIED",
        |       max(CASE WHEN p = '5-LOW' THEN avg_price END) AS "5-LOW"
        |FROM m
        |UNION ALL
        |SELECT 'n_orders',
        |       max(CASE WHEN p = '1-URGENT' THEN n_orders END),
        |       max(CASE WHEN p = '2-HIGH' THEN n_orders END),
        |       max(CASE WHEN p = '3-MEDIUM' THEN n_orders END),
        |       max(CASE WHEN p = '4-NOT SPECIFIED' THEN n_orders END),
        |       max(CASE WHEN p = '5-LOW' THEN n_orders END)
        |FROM m
        |UNION ALL
        |SELECT 'total_price',
        |       max(CASE WHEN p = '1-URGENT' THEN total_price END),
        |       max(CASE WHEN p = '2-HIGH' THEN total_price END),
        |       max(CASE WHEN p = '3-MEDIUM' THEN total_price END),
        |       max(CASE WHEN p = '4-NOT SPECIFIED' THEN total_price END),
        |       max(CASE WHEN p = '5-LOW' THEN total_price END)
        |FROM m
        |ORDER BY metric""".stripMargin,

    // DuckDB's two-step AT TIME ZONE idiom over the same stored UTC
    // micros; January fixture instants sit on fixed -5/+9 offsets
    "ts_timezone" ->
      """SELECT event_id,
        |       CAST(ts AT TIME ZONE 'UTC'
        |              AT TIME ZONE 'America/New_York' AS TIMESTAMP)
        |         AS ny_local,
        |       CAST(ts AT TIME ZONE 'UTC'
        |              AT TIME ZONE 'Asia/Tokyo' AS TIMESTAMP)
        |         AS tokyo_local,
        |       CAST(hour(ts AT TIME ZONE 'UTC'
        |              AT TIME ZONE 'America/New_York') AS BIGINT)
        |         AS ny_hour,
        |       CAST(ts AT TIME ZONE 'UTC'
        |              AT TIME ZONE 'Asia/Tokyo' AS DATE) AS tokyo_date
        |FROM events
        |WHERE user_id % 50 = 0
        |ORDER BY event_id""".stripMargin,

    "agg_boolean" ->
      """SELECT c_mktsegment,
        |       bool_and(c_acctbal > -500) AS all_above_floor,
        |       bool_or(c_acctbal > 9000) AS any_premium,
        |       CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative,
        |       upper(c_mktsegment) AS seg_upper,
        |       count(*) AS n
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // rebalancing is physical only — read-back equals the projection
    "write_rebalance" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       l_returnflag, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber""".stripMargin,

    // identical recursion in DuckDB (// is Spark's DIV); sums cast
    // back from DuckDB's HUGEINT
    "sql_recursive_cte" ->
      """WITH RECURSIVE anc(node, cur, d) AS (
        |  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT)
        |  FROM part WHERE p_partkey % 97 = 0
        |  UNION ALL
        |  SELECT node, cur // 2, d + 1 FROM anc WHERE cur > 0
        |)
        |SELECT node, CAST(max(d) AS BIGINT) AS depth,
        |       CAST(sum(cur) AS BIGINT) AS path_sum
        |FROM anc
        |GROUP BY node
        |ORDER BY node""".stripMargin,

    // three rows per event reconstructed from the same base columns;
    // the typed access nulls on the string element in both engines
    "variant_explode" ->
      """WITH base AS (
        |  SELECT event_id,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |         event_type
        |  FROM events
        |)
        |SELECT event_id, pos, item_json, item_num FROM (
        |  SELECT event_id, 0 AS pos,
        |         CAST(k AS VARCHAR) AS item_json, k AS item_num
        |  FROM base
        |  UNION ALL
        |  SELECT event_id, 1, CAST(k * 2 AS VARCHAR), k * 2 FROM base
        |  UNION ALL
        |  SELECT event_id, 2, '"' || event_type || '"', NULL FROM base
        |)
        |ORDER BY event_id, pos""".stripMargin,

    // map renders replay as sorted-key JSON object strings (insertion
    // order == sorted order on the Spark side by construction)
    "map_hof" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY user_id, event_type
        |)
        |SELECT user_id,
        |       '{' || string_agg('"' || event_type || '":' || n, ','
        |              ORDER BY event_type) || '}' AS m_json,
        |       '{' || string_agg('"' || event_type || '":' || (n * 2), ','
        |              ORDER BY event_type) || '}' AS doubled_json,
        |       '{' || coalesce(string_agg('"' || event_type || '":' || n,
        |              ',' ORDER BY event_type)
        |              FILTER (WHERE n >= 2), '') || '}' AS filtered_json,
        |       '{' || string_agg('"' || event_type || '":' || (n * 3), ','
        |              ORDER BY event_type) || '}' AS tripled_json,
        |       count(*) AS n_keys
        |FROM c
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // the re-read array equals the slice it was rendered from
    "scan_json_multiline" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 4) AS bal
        |FROM customer
        |WHERE c_custkey % 50 = 0
        |ORDER BY c_custkey""".stripMargin,

    // class-by-class replay with the OTHER class replaced first (the
    // custom replacement chars collide with later classes otherwise)
    "str_mask" ->
      """SELECT c_custkey,
        |       regexp_replace(regexp_replace(regexp_replace(c_name,
        |         '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |         AS masked_default,
        |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |         c_name, '[^A-Za-z0-9]', '-', 'g'),
        |         '[A-Z]', '#', 'g'), '[a-z]', '*', 'g'), '[0-9]', '9', 'g')
        |         AS masked_custom,
        |       length(c_name) AS mask_len
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    // identical md5-derived bucket arithmetic; sparse render is a
    // sorted bucket:count join bounded by D=64
    "text_hashing_vec" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ')) AS term
        |  FROM documents
        |), b AS (
        |  SELECT doc_id,
        |         CAST('0x' || substring(md5(term), 1, 6) AS BIGINT)
        |           % 64 AS b
        |  FROM tok
        |), c AS (
        |  SELECT doc_id, b, count(*) AS n FROM b GROUP BY doc_id, b
        |)
        |SELECT doc_id,
        |       string_agg(b || ':' || n, ' ' ORDER BY b) AS svec,
        |       count(*) AS nnz,
        |       CAST(sum(n) AS BIGINT) AS n_tokens
        |FROM c
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // PERMISSIVE semantics replayed from the corruption rules:
    // truncated rows (k%140, precedence) null the missing field, type
    // poison (k%60) nulls only the poisoned field; the raw line
    // reconstructs engine-identically from integer cents
    "scan_corrupt_records" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderpriority AS prio
        |  FROM orders WHERE o_orderkey % 20 = 0
        |)
        |SELECT k,
        |       CASE WHEN k % 60 = 0 AND k % 140 <> 0 THEN NULL
        |            ELSE cents END AS cents,
        |       CASE WHEN k % 140 = 0 THEN NULL
        |            WHEN k % 60 = 0 THEN prio
        |            ELSE prio END AS prio,
        |       (k % 140 = 0 OR k % 60 = 0) AS is_corrupt,
        |       CASE WHEN k % 140 = 0 THEN k || ',' || cents
        |            WHEN k % 60 = 0 THEN k || ',X,' || prio
        |            ELSE '' END AS raw_line
        |FROM o
        |ORDER BY k""".stripMargin,

    // UNION ALL with the explicit NULL column — what unionByName
    // (allowMissingColumns) aligns automatically
    "set_union_evolving" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS price,
        |       '~missing~' AS prio
        |FROM orders WHERE o_orderkey % 7 = 1
        |UNION ALL
        |SELECT o_orderkey, round(o_totalprice, 4), o_orderpriority
        |FROM orders WHERE o_orderkey % 7 = 2
        |ORDER BY o_orderkey""".stripMargin,

    // the native session window's END is last_event + gap by
    // definition — replayed over the hand-built gap islands, so the
    // green hash proves native == manual
    "agg_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us FROM events
        |), f AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER
        |             (PARTITION BY user_id ORDER BY ts_us) IS NULL
        |           OR ts_us - lag(ts_us) OVER
        |             (PARTITION BY user_id ORDER BY ts_us)
        |             > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |), s AS (
        |  SELECT user_id, ts_us,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
        |           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f
        |)
        |SELECT user_id,
        |       min(ts_us) AS start_us,
        |       max(ts_us) + 30 * 60 * 1000000 AS end_us,
        |       count(*) AS n_events
        |FROM s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, start_us""".stripMargin,

    // bounded correlated pick: the first order at/after the event,
    // voided when beyond the 7-day horizon
    "join_asof_tolerance" ->
      """WITH e AS (
        |  SELECT event_id, user_id AS uid,
        |         ts - INTERVAL 26 YEARS AS t
        |  FROM events
        |), o AS (
        |  SELECT o_custkey AS uid, o_orderdate AS t, o_orderkey
        |  FROM orders
        |)
        |SELECT e.event_id,
        |       coalesce((
        |         SELECT o.o_orderkey FROM o
        |         WHERE o.uid = e.uid AND o.t >= e.t
        |           AND epoch_us(o.t) - epoch_us(e.t)
        |               <= CAST(7 AS BIGINT) * 86400 * 1000000
        |         ORDER BY o.t, o.o_orderkey LIMIT 1), -1) AS next_order
        |FROM e
        |ORDER BY e.event_id""".stripMargin,

    // DuckDB's windowed quantile_disc floor-interpolation equals the
    // lower-median pick at every frame parity
    "win_median_smooth" ->
      """WITH m AS (
        |  SELECT event_id, user_id, value,
        |         quantile_disc(value, 0.5) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS med_raw
        |  FROM events WHERE user_id % 20 = 0
        |)
        |SELECT event_id, user_id,
        |       round(med_raw, 4) AS smoothed,
        |       value > med_raw * 3 AS spike
        |FROM m
        |ORDER BY event_id""".stripMargin,

    // same md5-uniform draw as corpus_mix; share is an IEEE-exact
    // long/long division on both sides
    "corpus_split" ->
      """WITH tagged AS (
        |  SELECT doc_id, lang, n_chars,
        |         CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |                        AS INT) / 16777216.0 < 0.9 THEN 'train'
        |              WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |                        AS INT) / 16777216.0 < 0.95 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents
        |)
        |SELECT split, lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |       round(count(*) * 1.0 /
        |             sum(count(*)) OVER (PARTITION BY lang), 4) AS share
        |FROM tagged
        |GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,

    // ranking replays the exact-integer ratio, ln only renders pmi;
    // parallel unnests zip positionally in DuckDB, giving the same
    // shift-zip bigrams as the slice/arrays_zip form
    "text_ngram_colloc" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents
        |), uni AS (
        |  SELECT w, count(*) AS c_w FROM (
        |    SELECT unnest(ws) AS w FROM toks
        |  ) WHERE w <> '' GROUP BY w
        |), bi AS (
        |  SELECT a, b, count(*) AS n_ab FROM (
        |    SELECT unnest(ws[1:len(ws)-1]) AS a,
        |           unnest(ws[2:len(ws)]) AS b
        |    FROM toks
        |  ) WHERE a <> '' AND b <> '' GROUP BY a, b
        |), tot AS (
        |  SELECT CAST(sum(n_ab) AS BIGINT) AS n_bi FROM bi
        |)
        |SELECT a, b, n_ab,
        |       round(ln(CAST(n_ab * n_bi AS DOUBLE) /
        |                CAST(c_a * c_b AS DOUBLE)), 4) AS pmi
        |FROM (
        |  SELECT bi.a, bi.b, bi.n_ab, ua.c_w AS c_a, ub.c_w AS c_b, tot.n_bi
        |  FROM bi
        |  JOIN uni ua ON ua.w = bi.a
        |  JOIN uni ub ON ub.w = bi.b
        |  CROSS JOIN tot
        |  WHERE bi.n_ab >= 5
        |)
        |ORDER BY CAST(n_ab * n_bi AS DOUBLE) / CAST(c_a * c_b AS DOUBLE) DESC,
        |         a, b
        |LIMIT 40""".stripMargin,

    // the oracle is the PLAIN theta join — a green hash proves the
    // grid-bucketed equi formulation finds exactly the overlap set
    "join_interval_overlap" ->
      """WITH a AS (
        |  SELECT event_id AS a_id, epoch_us(ts) AS a_s,
        |         epoch_us(ts) + 600000000 AS a_e
        |  FROM events WHERE user_id % 20 = 0
        |), b AS (
        |  SELECT event_id AS b_id, epoch_us(ts) AS b_s,
        |         epoch_us(ts) + 900000000 AS b_e
        |  FROM events WHERE user_id % 31 = 0
        |)
        |SELECT a_id, b_id,
        |       least(a_e, b_e) - greatest(a_s, b_s) AS ovl_us
        |FROM a JOIN b ON a_s < b_e AND b_s < a_e
        |ORDER BY a_id, b_id""".stripMargin,

    // α = 1/2: every weight an exact power of two, addition order
    // written identically — bitwise-deterministic cross-engine
    "ts_holt_winters" -> holtWintersOracle,

    "ts_forecast_holt" ->
      """WITH RECURSIVE seq AS (
        |  SELECT user_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS i,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL AND user_id % 20 = 0
        |), nn AS (
        |  SELECT user_id, max(i) AS n FROM seq GROUP BY 1
        |), rec AS (
        |  SELECT user_id, i, CAST(c AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
        |  FROM seq WHERE i = 1
        |  UNION ALL
        |  SELECT r.user_id, s.i,
        |         (CAST(s.c AS DOUBLE) + (r.l + r.b)) / 2 AS l,
        |         (((CAST(s.c AS DOUBLE) + (r.l + r.b)) / 2) - r.l) / 2
        |           + r.b / 2 AS b
        |  FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
        |)
        |SELECT r.user_id, CAST(nn.n AS BIGINT) AS n,
        |       CAST(floor(1e6 * r.l) AS BIGINT) AS level_micro,
        |       CAST(floor(1e6 * r.b) AS BIGINT) AS trend_micro,
        |       CAST(floor(1e6 * (r.l + 1.0 * r.b)) AS BIGINT) AS f1_micro,
        |       CAST(floor(1e6 * (r.l + 2.0 * r.b)) AS BIGINT) AS f2_micro,
        |       CAST(floor(1e6 * (r.l + 3.0 * r.b)) AS BIGINT) AS f3_micro
        |FROM rec r JOIN nn ON r.user_id = nn.user_id AND r.i = nn.n
        |ORDER BY r.user_id""".stripMargin,

    "ts_ewma" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts, value
        |  FROM events WHERE user_id % 20 = 0
        |), l AS (
        |  SELECT event_id, user_id, value,
        |         lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2,
        |         lag(value, 3) OVER w AS v3, lag(value, 4) OVER w AS v4,
        |         lag(value, 5) OVER w AS v5, lag(value, 6) OVER w AS v6,
        |         lag(value, 7) OVER w AS v7
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_id, user_id,
        |       round((value * 1.0 + coalesce(v1, 0) * 0.5
        |              + coalesce(v2, 0) * 0.25 + coalesce(v3, 0) * 0.125
        |              + coalesce(v4, 0) * 0.0625 + coalesce(v5, 0) * 0.03125
        |              + coalesce(v6, 0) * 0.015625
        |              + coalesce(v7, 0) * 0.0078125)
        |             /
        |             (1.0 + CASE WHEN v1 IS NOT NULL THEN 0.5 ELSE 0.0 END
        |              + CASE WHEN v2 IS NOT NULL THEN 0.25 ELSE 0.0 END
        |              + CASE WHEN v3 IS NOT NULL THEN 0.125 ELSE 0.0 END
        |              + CASE WHEN v4 IS NOT NULL THEN 0.0625 ELSE 0.0 END
        |              + CASE WHEN v5 IS NOT NULL THEN 0.03125 ELSE 0.0 END
        |              + CASE WHEN v6 IS NOT NULL THEN 0.015625 ELSE 0.0 END
        |              + CASE WHEN v7 IS NOT NULL THEN 0.0078125 ELSE 0.0 END),
        |             4) AS ewma
        |FROM l
        |ORDER BY event_id""".stripMargin,

    // tags strip FIRST, entities unescape SECOND — &lt;nav&gt; stays
    // literal content, never re-parsed as a tag
    "text_html_strip" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |         '<html><body><h1>Doc ' || doc_id || '</h1><p class="body">' ||
        |         text ||
        |         '</p><div>&amp; footer &lt;nav&gt; &quot;menu&quot;</div></body></html>'
        |           AS t
        |  FROM documents
        |), cleaned AS (
        |  SELECT doc_id, t,
        |         trim(regexp_replace(
        |           replace(replace(replace(replace(
        |             regexp_replace(t, '<[^>]+>', ' ', 'g'),
        |             '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |           '[ \t\n\x0B\f\r]+', ' ', 'g')) AS clean
        |  FROM aug
        |)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(t, '<[^>]+>')) AS BIGINT) AS n_tags,
        |       CAST(len(clean) AS BIGINT) AS n_chars_clean,
        |       md5(clean) AS clean_md5
        |FROM cleaned
        |ORDER BY doc_id""".stripMargin,

    // the oracle is the IN-lookup on the ORIGINAL table: a green hash
    // proves the bloom-written copy round-trips and prunes losslessly
    "scan_parquet_bloom" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders
        |WHERE o_custkey IN (7, 23, 48, 97, 120)
        |ORDER BY o_orderkey""".stripMargin,

    // edges from the SAME deterministic md5 sample, rounded to 4dp
    // BEFORE bucketing (removes the last-ulp interpolation hazard);
    // per-bucket sums in exact integer cents
    "agg_quantile_bucket" ->
      """WITH e AS (
        |  SELECT round(quantile_cont(o_totalprice, 0.25), 4) AS e1,
        |         round(quantile_cont(o_totalprice, 0.5), 4) AS e2,
        |         round(quantile_cont(o_totalprice, 0.75), 4) AS e3
        |  FROM orders
        |  WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6)
        |             AS INT) / 16777216.0 < 0.02
        |)
        |SELECT o_orderpriority,
        |       CAST(1 + CAST(o_totalprice > e1 AS INT)
        |              + CAST(o_totalprice > e2 AS INT)
        |              + CAST(o_totalprice > e3 AS INT) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |            AS BIGINT) AS sum_cents,
        |       round(min(o_totalprice), 4) AS min_price,
        |       round(max(o_totalprice), 4) AS max_price
        |FROM orders, e
        |GROUP BY o_orderpriority, bucket
        |ORDER BY o_orderpriority, bucket""".stripMargin,

    // flat replay of the merged state: base rows minus deletes, updates
    // applied (changelog carries the doubled cents), inserts appended —
    // a green hash certifies the partitioned rewrite produced EXACTLY
    // the ANSI MERGE result
    "merge_into" -> mergedStateOracle,

    // The STREAMING merge reaches the identical final state (batch
    // order cannot matter: changelog keys are disjoint across ops), so
    // it shares the batch key's oracle — a full correctness gate on a
    // streaming key, not a spec-only check.
    "stream_merge_cdc" -> mergedStateOracle,

    // Batch replay of dropDuplicatesWithinWatermark's deterministic
    // 3-batch run (VERDICT r17 item 5 — the merge_cdc argument extended:
    // the emission history is a pure function of the declared input, so
    // the streaming key carries a FULL oracle, not just the spec pin).
    // Semantics replayed relationally, batch by unrolled batch:
    //  - the watermark in effect DURING batch b is max event time of
    //    the EARLIER batches − 10 min (Spark watermarks lag one batch);
    //  - a row emits iff no PREVIOUSLY EMITTED row with its key is
    //    still live (first occurrence's ts + 10 min ≥ current
    //    watermark); dropped duplicates do NOT refresh state — state
    //    entries come only from emitted rows, which is what makes the
    //    unrolled-stage replay exact.
    "stream_dedup" ->
      """WITH inp(batch, event_id, ts, value) AS (VALUES
        |  (0, 1, TIMESTAMP '2024-01-01 10:00:00', 1.0),
        |  (0, 2, TIMESTAMP '2024-01-01 10:01:00', 2.0),
        |  (1, 1, TIMESTAMP '2024-01-01 10:02:00', 99.0),
        |  (1, 3, TIMESTAMP '2024-01-01 10:03:00', 3.0),
        |  (1, 99, TIMESTAMP '2024-01-01 12:00:00', 9.0),
        |  (2, 1, TIMESTAMP '2024-01-01 12:30:00', 4.0)
        |), wm AS (
        |  SELECT batch,
        |         coalesce(max(mx) OVER (ORDER BY batch
        |                    ROWS BETWEEN UNBOUNDED PRECEDING
        |                    AND 1 PRECEDING) - INTERVAL 10 MINUTE,
        |                  TIMESTAMP '1970-01-01 00:00:00') AS w
        |  FROM (SELECT batch, max(ts) AS mx FROM inp GROUP BY batch)
        |), e0 AS (
        |  SELECT event_id, ts, value FROM inp WHERE batch = 0
        |), e1 AS (
        |  SELECT i.event_id, i.ts, i.value FROM inp i, wm
        |  WHERE i.batch = 1 AND wm.batch = 1
        |    AND NOT EXISTS (SELECT 1 FROM e0 p
        |                    WHERE p.event_id = i.event_id
        |                      AND p.ts + INTERVAL 10 MINUTE >= wm.w)
        |), e2 AS (
        |  SELECT i.event_id, i.ts, i.value FROM inp i, wm
        |  WHERE i.batch = 2 AND wm.batch = 2
        |    AND NOT EXISTS (SELECT 1 FROM (SELECT * FROM e0
        |                                   UNION ALL SELECT * FROM e1) p
        |                    WHERE p.event_id = i.event_id
        |                      AND p.ts + INTERVAL 10 MINUTE >= wm.w)
        |)
        |SELECT CAST(event_id AS BIGINT) AS event_id,
        |       CAST(value AS DOUBLE) AS value
        |FROM (SELECT event_id, value FROM e0
        |      UNION ALL SELECT event_id, value FROM e1
        |      UNION ALL SELECT event_id, value FROM e2)
        |ORDER BY event_id, value""".stripMargin,

    // Batch replay of the stream-static anti-join's deterministic
    // 2-batch run (VERDICT r17 item 5): STATELESS per-batch semantics
    // means the emission set is exactly "input rows whose normalized
    // content hash misses the historical dimension" — within-stream
    // duplicates pass through by contract, so both novel-text rows
    // emit. The dup text is the corpus's first doc, referenced from the
    // documents table itself; the hash replay is the dedup_exact
    // normalizer fold (NFD+STRIPMARK before lower, ws collapse, trim).
    "stream_static_join" ->
      """WITH hist AS (
        |  SELECT DISTINCT sha256(trim(regexp_replace(
        |    lower(strip_accents(nfc_normalize(text))), '\s+', ' ', 'g')))
        |    AS h
        |  FROM documents
        |), dup0 AS (
        |  SELECT text FROM documents ORDER BY doc_id LIMIT 1
        |), inp(new_id, text) AS (
        |  SELECT CAST(1000 AS BIGINT), (SELECT text FROM dup0)
        |  UNION ALL SELECT 1001,
        |    'graft stream static join novel text never in corpus'
        |  UNION ALL SELECT 1002,
        |    'graft stream static join novel text never in corpus'
        |  UNION ALL SELECT 1003, (SELECT text FROM dup0)
        |)
        |SELECT new_id FROM inp
        |WHERE sha256(trim(regexp_replace(
        |        lower(strip_accents(nfc_normalize(text))),
        |        '\s+', ' ', 'g'))) NOT IN (SELECT h FROM hist)
        |ORDER BY new_id""".stripMargin,

    // Batch replay of the stream-stream inner join's deterministic
    // single-round run (VERDICT r18 item 1): inner time-range matches
    // emit as soon as both sides are present in a batch — watermarks
    // govern state EVICTION only, never emission — and all rows are
    // delivered before the first trigger, so the emission set equals
    // the batch theta-join exactly. Ad 2's +45 min click is excluded
    // by the join condition itself, batch-independently.
    "stream_join" ->
      """WITH imp(ad_id, imp_ts) AS (VALUES
        |  (1, TIMESTAMP '2024-01-01 10:00:00'),
        |  (2, TIMESTAMP '2024-01-01 10:05:00'),
        |  (3, TIMESTAMP '2024-01-01 10:10:00')
        |), clk(c_ad_id, click_ts) AS (VALUES
        |  (1, TIMESTAMP '2024-01-01 10:20:00'),
        |  (2, TIMESTAMP '2024-01-01 10:50:00'),
        |  (3, TIMESTAMP '2024-01-01 10:15:00')
        |)
        |SELECT CAST(ad_id AS BIGINT) AS ad_id,
        |       CAST(date_diff('second', imp_ts, click_ts) AS BIGINT)
        |         AS delay_sec
        |FROM imp JOIN clk
        |  ON ad_id = c_ad_id
        | AND click_ts >= imp_ts
        | AND click_ts <= imp_ts + INTERVAL 30 MINUTE
        |ORDER BY ad_id""".stripMargin,

    // Batch replay of the watermarked tumbling-window append-mode run
    // (VERDICT r18 item 1 — the stream_dedup unrolling technique over
    // WINDOW state): the watermark in effect DURING batch b is the max
    // event time of EARLIER batches − 10 min (Spark watermarks lag one
    // batch); an input row is DROPPED iff its window's end ≤ that
    // watermark (the state for that window is already finalized); a
    // window EMITS in append mode iff its end ≤ the FINAL watermark
    // (later windows are still open when the query stops). Both
    // addData blocks of round 1 share batch 0 — no row of either block
    // can be dropped under any split of them (the earliest possible
    // inter-block watermark, 09:55, predates every window), so the
    // replay is split-robust.
    "stream_late_data" ->
      """WITH inp(batch, ts, value) AS (VALUES
        |  (0, TIMESTAMP '2024-01-01 10:01:00', 1.0),
        |  (0, TIMESTAMP '2024-01-01 10:05:00', 2.0),
        |  (0, TIMESTAMP '2024-01-01 10:12:00', 4.0),
        |  (0, TIMESTAMP '2024-01-01 10:25:00', 8.0),
        |  (1, TIMESTAMP '2024-01-01 10:03:00', 100.0),
        |  (1, TIMESTAMP '2024-01-01 10:45:00', 16.0)
        |), wm AS (
        |  SELECT batch,
        |         coalesce(max(mx) OVER (ORDER BY batch
        |                    ROWS BETWEEN UNBOUNDED PRECEDING
        |                    AND 1 PRECEDING) - INTERVAL 10 MINUTE,
        |                  TIMESTAMP '1970-01-01 00:00:00') AS w
        |  FROM (SELECT batch, max(ts) AS mx FROM inp GROUP BY batch)
        |), kept AS (
        |  SELECT time_bucket(INTERVAL 10 MINUTE, i.ts) AS ws, i.value
        |  FROM inp i JOIN wm ON wm.batch = i.batch
        |  WHERE time_bucket(INTERVAL 10 MINUTE, i.ts)
        |        + INTERVAL 10 MINUTE > wm.w
        |), fin AS (
        |  SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM inp
        |)
        |SELECT ws, count(*) AS n,
        |       round(sum(CAST(value AS DOUBLE)), 4) AS sum_value
        |FROM kept, fin
        |GROUP BY ws, fin.w
        |HAVING ws + INTERVAL 10 MINUTE <= fin.w
        |ORDER BY ws""".stripMargin,

    // every output precision/scale pinned to Spark's widening results:
    // sum(12,2) → (22,2), (12,2)×(3,2) → (16,4), its sum → (26,4);
    // DuckDB's own widths (38,·) CAST down so the typed compare sees
    // identical decimal types. Decimal arithmetic is exact on both
    // sides — no rounding anywhere except the one double avg.
    "agg_decimal" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
        |            AS DECIMAL(22,2)) AS sum_price,
        |       min(CAST(l_extendedprice AS DECIMAL(12,2))) AS min_price,
        |       max(CAST(l_extendedprice AS DECIMAL(12,2))) AS max_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(1.07 AS DECIMAL(3,2)))
        |            AS DECIMAL(26,4)) AS sum_taxed,
        |       count(*) AS n,
        |       round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
        |                       AS DECIMAL(22,2)) AS DOUBLE)
        |             / count(*), 4) AS avg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // TPC-H Q3 shape (shipping priority): revenue summed in exact
    // integer micro-units, rendered once — identical BIGINT sums on
    // both engines, so the top-10 cut is tie-broken deterministically
    // by l_orderkey.
    "tpch_q3" ->
      """SELECT l_orderkey,
        |       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e6)
        |                      AS BIGINT)) / 1e6, 4) AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate  > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    // TPC-H Q18 shape (large-volume customer): quantity is integral in
    // TPC-H → BIGINT-exact HAVING; totalprice rendered from exact cents.
    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |       round(CAST(round(o_totalprice * 100) AS BIGINT) / 1e2, 2)
        |         AS o_totalprice,
        |       sq.sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(l_quantity AS BIGINT)) > 200) sq
        |  ON o_orderkey = sq.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,

    // Asymmetric containment C = |A∩B| / min(|A|,|B|) over the same
    // 5-gram shingle sets as dedupPairsOracle; Jaccard carried
    // alongside. Exact string-shingle replay of the hashed-shingle
    // inverted index.
    "dedup_containment" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
        |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
        |  WHERE len(w) >= 5
        |), cnt AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |       round(c * 1.0 / least(na.n, nb.n), 4) AS containment,
        |       round(c * 1.0 / (na.n + nb.n - c), 4) AS jaccard
        |FROM inter
        |JOIN cnt na ON doc_a = na.doc_id
        |JOIN cnt nb ON doc_b = nb.doc_id
        |WHERE c * 1.0 / least(na.n, nb.n) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Per-user event-type sequence string (total order ts, event_id —
    // identical tie-break on both engines) + regex funnel match.
    "seq_pattern" ->
      """SELECT user_id, count(*) AS n_events,
        |       string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq,
        |       regexp_matches(string_agg(event_type, ' ' ORDER BY ts, event_id),
        |                      'view.*click.*purchase') AS matched,
        |       len(string_split(string_agg(event_type, ' ' ORDER BY ts, event_id),
        |                        'purchase')) - 1 AS n_purchase
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // Flat replay of both committed versions: v0 is exactly the base
    // state (snapshot isolation — the v1 write didn't leak into it),
    // v1 is exactly the copy-on-write update (click cents doubled).
    "table_snapshot" ->
      """WITH base AS (
        |  SELECT event_id, user_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents, event_type
        |  FROM events
        |)
        |SELECT event_id, user_id, cents, event_type,
        |       CAST(0 AS BIGINT) AS version FROM base
        |UNION ALL
        |SELECT event_id, user_id,
        |       CASE WHEN event_type = 'click' THEN cents * 2
        |            ELSE cents END AS cents,
        |       event_type, CAST(1 AS BIGINT) AS version FROM base
        |ORDER BY version, event_id""".stripMargin,

    // Identical raw-URL synthesis + the same canonicalization regexp
    // chain ('g' flag: Spark's regexp_replace is replace-all).
    "dedup_url" ->
      """WITH r AS (
        |  SELECT event_id,
        |         'https://'
        |         || CASE WHEN event_id % 2 = 0 THEN 'CDN.Example.COM'
        |                 ELSE 'cdn.example.com' END
        |         || CASE WHEN event_id % 3 = 0 THEN ':443' ELSE '' END
        |         || '/Page/' || CAST(event_id % 200 AS VARCHAR)
        |         || CASE WHEN event_id % 5 = 0 THEN '/' ELSE '' END
        |         || '?id='
        |         || CAST(COALESCE(CAST(json_extract_string(props, '$.k')
        |                               AS BIGINT), 0) % 100 AS VARCHAR)
        |         || CASE WHEN event_id % 4 = 1
        |                 THEN '&utm_source=feed&utm_campaign=x'
        |                 ELSE '' END
        |         || CASE WHEN event_id % 7 = 2
        |                 THEN '#sec' || CAST(event_id % 5 AS VARCHAR)
        |                 ELSE '' END AS raw
        |  FROM events
        |), c AS (
        |  SELECT event_id, raw,
        |         regexp_replace(
        |           regexp_replace(
        |             regexp_replace(
        |               regexp_replace(raw, '#.*$', '', 'g'),
        |               '&utm_[a-z]+=[^&]*', '', 'g'),
        |             ':443/', '/', 'g'),
        |           '/\?', '?', 'g') AS c4
        |  FROM r
        |)
        |SELECT lower(regexp_extract(c4, '^(https?://[^/]+)', 1))
        |       || regexp_extract(c4, '^https?://[^/]+(.*)$', 1) AS url,
        |       count(*) AS n_raw,
        |       count(DISTINCT raw) AS n_variants,
        |       min(event_id) AS first_id
        |FROM c
        |GROUP BY 1
        |ORDER BY url""".stripMargin,

    // Post-vacuum read = exactly the v1 state: the expire deleted only
    // v0-only files, never live bytes.
    "snapshot_expire" ->
      """SELECT event_id, user_id,
        |       CASE WHEN event_type = 'click'
        |            THEN CAST(round(value * 100) AS BIGINT) * 2
        |            ELSE CAST(round(value * 100) AS BIGINT) END AS cents,
        |       event_type
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // The kept-file union filtered to the manifest-derived [lo, hi]
    // must equal the plain predicate over the source — a pruning bug
    // that drops a boundary file breaks the hash. lo/hi replay the
    // manifest's global min/max as scalar subqueries (footer stats are
    // exact for INT64); the files-read < files-live physical claim is
    // SnapshotSpec's, not the oracle's.
    "snapshot_skipping" ->
      """WITH b AS (
        |  SELECT min(event_id) AS mn, max(event_id) AS mx FROM events
        |)
        |SELECT event_id, user_id,
        |       CAST(round(value * 100) AS BIGINT) AS cents,
        |       event_type
        |FROM events, b
        |WHERE event_id >= mn + (mx - mn) // 4
        |  AND event_id <= mn + 3 * (mx - mn) // 8
        |ORDER BY event_id""".stripMargin,

    // The racing writers rewrite DISJOINT partitions (click ×2,
    // view ×3), so the final v2 state is independent of who won the
    // optimistic-commit race; the winner/loser mechanics are pinned in
    // SnapshotSpec, the deterministic final state here.
    "snapshot_concurrent" ->
      """SELECT event_id, user_id,
        |       CAST(round(value * 100) AS BIGINT)
        |         * CASE event_type WHEN 'click' THEN 2
        |                           WHEN 'view' THEN 3
        |                           ELSE 1 END AS cents,
        |       event_type
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // The racing MERGE writers' updates COMMUTE (+10 on mod-3 ids,
    // +100 on mod-5 — overlap on mod-15 gets both), so the serial
    // order the version CAS forces is irrelevant to the final state:
    // a green hash certifies no lost update survived the conflict
    // (the loser recomputed on the winner's base, not over it). The
    // winner/loser mechanics are pinned in SnapshotSpec.
    "merge_concurrent" ->
      """SELECT event_id, user_id,
        |       CAST(round(value * 100) AS BIGINT)
        |         + CASE WHEN event_id % 3 = 0 THEN 10 ELSE 0 END
        |         + CASE WHEN event_id % 5 = 0 THEN 100 ELSE 0 END
        |         AS cents,
        |       event_type
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // Brute-force A×B radius scan — deliberately NOT the grid
    // algorithm, so a green hash certifies the grid join's
    // completeness, not a replay.
    "join_grid_2d" ->
      """WITH a AS (
        |  SELECT event_id AS a_id,
        |         (event_id * 7919) % 10000 AS a_x,
        |         (event_id * 104729) % 10000 AS a_y
        |  FROM events WHERE event_id % 17 = 0
        |), b AS (
        |  SELECT event_id AS b_id,
        |         (event_id * 3571) % 10000 AS b_x,
        |         (event_id * 9973) % 10000 AS b_y
        |  FROM events WHERE event_id % 13 = 0
        |)
        |SELECT a_id, b_id,
        |       (a_x-b_x)*(a_x-b_x) + (a_y-b_y)*(a_y-b_y) AS dist_sq
        |FROM a, b
        |WHERE (a_x-b_x)*(a_x-b_x) + (a_y-b_y)*(a_y-b_y) <= 22500
        |ORDER BY a_id, b_id""".stripMargin,

    // Classic TPC-H Q5 formulation (ANSI join chain + region/date
    // filters); money summed in exact integer micro-units, CAST
    // against DuckDB's HUGEINT widening, one render at the end.
    "tpch_q5" ->
      """SELECT n_name,
        |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                                 * 1e6) AS BIGINT)) AS BIGINT)
        |             / 1e6, 4) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    // Brute-force dominance NOT EXISTS over all pairs — deliberately
    // NOT the sort-scan algorithm, so a green hash certifies the
    // frontier's completeness against the quadratic definition.
    "skyline_2d" ->
      """WITH p AS (
        |  SELECT DISTINCT x, (9999 - x) + (event_id * 104729) % 1000 AS y
        |  FROM (SELECT (event_id * 7919) % 10000 AS x, event_id
        |        FROM events WHERE event_id % 17 = 0)
        |)
        |SELECT x, y FROM p s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p q
        |  WHERE q.x <= s.x AND q.y <= s.y AND (q.x < s.x OR q.y < s.y))
        |ORDER BY x""".stripMargin,

    // Same BM25 formula (Lucene idf variant), same shared
    // tokenization replay as text_tfidf; no score threshold — every
    // doc with >= 1 query-term hit returns, scores rounded 4dp.
    "rank_bm25" ->
      """WITH terms AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id
        |), qtf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms
        |  WHERE term IN ('dup', 'vector', 'hash')
        |  GROUP BY doc_id, term
        |), qdf AS (
        |  SELECT term, count(*) AS df FROM qtf GROUP BY term
        |), scalars AS (
        |  SELECT (SELECT count(*) FROM documents) AS n_docs,
        |         (SELECT avg(dl) FROM dl) AS avgdl
        |)
        |SELECT qtf.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_query_terms_hit,
        |       round(sum(
        |         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |         * (tf * 2.2)
        |         / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
        |FROM qtf
        |JOIN qdf USING (term)
        |JOIN dl USING (doc_id)
        |CROSS JOIN scalars
        |GROUP BY qtf.doc_id
        |ORDER BY qtf.doc_id""".stripMargin,

    // Classic Q7 formulation (nation-pair disjunction over the
    // four-table chain); micro-unit BIGINT sums CAST against DuckDB's
    // HUGEINT widening, year() already BIGINT in DuckDB (Spark side
    // casts to long to match).
    "tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l_shipdate) AS l_year,
        |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                                 * 1e6) AS BIGINT)) AS BIGINT)
        |             / 1e6, 4) AS revenue
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey
        |  AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey
        |  AND s_nationkey = n1.n_nationkey
        |  AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    // Classic Q8 numerator/denominator CASE-aggregate; both sums in
    // exact integer micro-units, the share is one double division
    // rendered floor(x*1e6) — integer output, no cross-engine
    // round() halfway exposure.
    "tpch_q8" ->
      """SELECT year(o_orderdate) AS o_year,
        |       CAST(floor(1e6
        |            * CAST(CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
        |                    THEN CAST(round(l_extendedprice * (1 - l_discount)
        |                                    * 1e6) AS BIGINT)
        |                    ELSE 0 END) AS BIGINT) AS DOUBLE)
        |            / CAST(CAST(sum(CAST(round(l_extendedprice
        |                    * (1 - l_discount) * 1e6) AS BIGINT)) AS BIGINT)
        |                    AS DOUBLE)) AS BIGINT) AS mkt_share_x1e6
        |FROM part, lineitem, orders, customer, supplier,
        |     nation n1, region, nation n2
        |WHERE p_partkey = l_partkey
        |  AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey
        |  AND c_nationkey = n1.n_nationkey
        |  AND n1.n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = n2.n_nationkey
        |  AND p_type = 'STANDARD'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Classic Q10 top-20 returned-revenue customers; exact micro-unit
    // revenue makes the cut deterministic, c_custkey breaks ties.
    "tpch_q10" ->
      """SELECT c_custkey, c_name,
        |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                                 * 1e6) AS BIGINT)) AS BIGINT)
        |             / 1e6, 4) AS revenue,
        |       round(CAST(round(c_acctbal * 100) AS BIGINT) / 1e2, 2)
        |         AS c_acctbal,
        |       n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND l_returnflag = 'R'
        |  AND c_nationkey = n_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // Classic Q13 two-level aggregate over a LEFT OUTER join (the
    // zero-order bucket must survive). Adaptation: the fixture orders
    // table has no o_comment, so the spec's comment NOT-LIKE filter
    // has no analogue — distribution is over all orders.
    "tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // Classic Q14 promo-share CASE-aggregate, one output row; both
    // sums exact micro-unit BIGINTs, one double division at render,
    // emitted floor(x*1e4) — integer output, halfway-safe.
    "tpch_q14" ->
      """SELECT CAST(floor(1e4 * 100.0
        |       * CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |              THEN CAST(round(l_extendedprice * (1 - l_discount)
        |                              * 1e6) AS BIGINT)
        |              ELSE 0 END) AS BIGINT) AS DOUBLE)
        |       / CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                              * 1e6) AS BIGINT)) AS BIGINT)
        |              AS DOUBLE)) AS BIGINT) AS promo_revenue_x1e4
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,

    // Classic Q15 via the revenue CTE (the spec's VIEW); every
    // supplier at the exact BIGINT max returns, ordered by suppkey.
    "tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                             * 1e6) AS BIGINT)) AS BIGINT)
        |           AS rev_micro
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name,
        |       round(rev_micro / 1e6, 4) AS total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_micro = (SELECT max(rev_micro) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    // Classic Q17 correlated-avg shape (per-part averages joined
    // back); the 0.2·avg threshold as an exact integer
    // cross-multiplication, the /7 render as an exact
    // multiple-of-7 division (identity 2-dp render).
    "tpch_q17" ->
      """WITH bp AS (
        |  SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'
        |), li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN bp ON l_partkey = p_partkey
        |), pa AS (
        |  SELECT l_partkey AS ap_partkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |         CAST(count(*) AS BIGINT) AS cnt_qty
        |  FROM li GROUP BY 1
        |)
        |SELECT round((cents - cents % 7) / 7 / 1e2, 2) AS avg_yearly
        |FROM (
        |  SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM li JOIN pa ON l_partkey = ap_partkey
        |  WHERE CAST(l_quantity AS BIGINT) * 5 * cnt_qty < sum_qty
        |)""".stripMargin,

    // Classic Q19 three-clause OR-of-ANDs (size bands standing in for
    // the absent p_container lists); exact micro-unit sum, one row.
    "tpch_q19" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                                 * 1e6) AS BIGINT)) AS BIGINT)
        |             / 1e6, 4) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // Classic Q22 scalar-avg + NOT EXISTS anti shape, nation standing
    // in for the absent phone country code; above-average as an exact
    // integer cross-multiplication, totals render identity 2-dp.
    "tpch_q22" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer
        |), pos AS (
        |  SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
        |         CAST(count(*) AS BIGINT) AS n_pos
        |  FROM cust WHERE bal_cents > 0
        |)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
        |       round(CAST(sum(bal_cents) AS BIGINT) / 1e2, 2) AS totacctbal
        |FROM cust, pos, nation
        |WHERE bal_cents * n_pos > sum_cents
        |  AND c_nationkey = n_nationkey
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // ntile remainder rule (earlier buckets take the extras) is
    // identical in both engines given the same TOTAL order — cents +
    // custkey tie-break make the order total.
    "win_ntile" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
        |         CAST(ntile(10) OVER (PARTITION BY c_mktsegment
        |           ORDER BY CAST(round(c_acctbal * 100) AS BIGINT),
        |                    c_custkey) AS BIGINT) AS decile
        |  FROM customer
        |)
        |SELECT c_mktsegment, decile, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(min(bal_cents) AS BIGINT) / 1e2, 2) AS lo_bal,
        |       round(CAST(max(bal_cents) AS BIGINT) / 1e2, 2) AS hi_bal
        |FROM c
        |GROUP BY c_mktsegment, decile
        |ORDER BY c_mktsegment, decile""".stripMargin,

    // Same three regex counts, same fixed scalar expression (spelled
    // identically — IEEE-identical doubles), floor(x*1000) render.
    "text_readability" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
        |    AS n_words,
        |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |    AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |    AS n_syllables,
        |  CAST(floor(1000.0 * (206.835
        |    - 1.015 * (CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |               AS DOUBLE)
        |       / CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |              AS DOUBLE))
        |    - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |              AS DOUBLE)
        |       / CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |              AS DOUBLE)))) AS BIGINT) AS flesch_x1000
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // Same 20-cell contingency, same window totals, same fixed
    // per-cell expressions (identical op order), floor renders.
    "stat_chi2" ->
      """WITH cells AS (
        |  SELECT event_type, user_id % 4 AS cohort,
        |         CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, cohort, o,
        |         CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
        |         CAST(sum(o) OVER (PARTITION BY cohort) AS BIGINT) AS ct,
        |         CAST(sum(o) OVER () AS BIGINT) AS n
        |  FROM cells
        |)
        |SELECT event_type, cohort, o,
        |  CAST(floor(1e6 * (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |                    / CAST(n AS DOUBLE))) AS BIGINT) AS e_x1e6,
        |  CAST(floor(1e6 * (((CAST(o AS DOUBLE)
        |         - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |           / CAST(n AS DOUBLE))
        |        * (CAST(o AS DOUBLE)
        |         - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |           / CAST(n AS DOUBLE)))
        |       / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |          / CAST(n AS DOUBLE)))) AS BIGINT) AS chi2_x1e6
        |FROM tot
        |ORDER BY event_type, cohort""".stripMargin,

    // Same one-pass conditional counts, same totals, same
    // sqrt/arithmetic-only contributions (IEEE-exact sqrt — no ln),
    // floor renders.
    "corpus_drift" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |), counts AS (
        |  SELECT term,
        |         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS p_cnt,
        |         CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS q_cnt
        |  FROM toks GROUP BY term
        |), totals AS (
        |  SELECT CAST(sum(p_cnt) AS BIGINT) AS p_tot,
        |         CAST(sum(q_cnt) AS BIGINT) AS q_tot
        |  FROM counts
        |)
        |SELECT term, p_cnt, q_cnt,
        |  CAST(floor(1e9 * (0.5
        |    * ((sqrt(CAST(p_cnt AS DOUBLE) / CAST(p_tot AS DOUBLE))
        |        - sqrt(CAST(q_cnt AS DOUBLE) / CAST(q_tot AS DOUBLE)))
        |       * (sqrt(CAST(p_cnt AS DOUBLE) / CAST(p_tot AS DOUBLE))
        |          - sqrt(CAST(q_cnt AS DOUBLE) / CAST(q_tot AS DOUBLE))))))
        |    AS BIGINT) AS hell2_x1e9,
        |  CAST(floor(1e9 * (0.5
        |    * abs(CAST(p_cnt AS DOUBLE) / CAST(p_tot AS DOUBLE)
        |          - CAST(q_cnt AS DOUBLE) / CAST(q_tot AS DOUBLE))))
        |    AS BIGINT) AS tv_x1e9
        |FROM counts CROSS JOIN totals
        |ORDER BY term""".stripMargin,

    // Single-window CDF replay (DuckDB needs no two-level split);
    // identical exact-integer gap and the same (max diff, smallest x)
    // tie-break via ORDER BY.
    "stat_ks" ->
      """WITH ev AS (
        |  SELECT value, user_id % 2 AS side
        |  FROM events WHERE value IS NOT NULL
        |), pts AS (
        |  SELECT value,
        |         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b
        |  FROM ev GROUP BY value
        |), tot AS (
        |  SELECT CAST(sum(a) AS BIGINT) AS n1,
        |         CAST(sum(b) AS BIGINT) AS n2
        |  FROM pts
        |), cum AS (
        |  SELECT value,
        |         CAST(sum(a) OVER (ORDER BY value) AS BIGINT) AS ca,
        |         CAST(sum(b) OVER (ORDER BY value) AS BIGINT) AS cb
        |  FROM pts
        |)
        |SELECT d_num, n1, n2, value_at FROM (
        |  SELECT abs(ca * n2 - cb * n1) AS d_num, n1, n2,
        |         value AS value_at,
        |         row_number() OVER (
        |           ORDER BY abs(ca * n2 - cb * n1) DESC, value) AS rn
        |  FROM cum CROSS JOIN tot
        |)
        |WHERE rn = 1""".stripMargin,

    // Single-window global rank replay; same exact-integer sums and
    // the same one-division floor render.
    "corpus_gini" ->
      """WITH ranked AS (
        |  SELECT n_chars,
        |         CAST(row_number() OVER (ORDER BY n_chars, doc_id)
        |              AS BIGINT) AS r
        |  FROM documents
        |), agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(n_chars) AS BIGINT) AS sx,
        |         CAST(sum(r * n_chars) AS BIGINT) AS srx
        |  FROM ranked
        |)
        |SELECT n, sx, srx,
        |  CAST(floor(1e6 * (CAST(2 * srx - (n + 1) * sx AS DOUBLE)
        |       / CAST(n * sx AS DOUBLE))) AS BIGINT) AS gini_x1e6
        |FROM agg""".stripMargin,

    // Whole-trajectory replay: 10 unrolled MATERIALIZED rounds — see
    // bpeTrainOracleSql.
    "token_bpe_train" -> bpeTrainOracleSql,
    "token_bpe" -> bpeApplyOracleSql,

    // Per-rule UNION replay of the one-pass rule suite; exact counts,
    // the FK rule as a NOT-IN count.
    "dq_expectations" ->
      """WITH base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN o_totalprice IS NULL
        |                         OR o_totalprice <= 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS v_price,
        |         CAST(sum(CASE WHEN o_orderdate IS NULL
        |                         OR o_orderdate < TIMESTAMP '1990-01-01'
        |                         OR o_orderdate >= TIMESTAMP '2002-01-01'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_date,
        |         CAST(sum(CASE WHEN o_orderstatus IS NULL
        |                         OR o_orderstatus NOT IN ('F', 'O', 'P')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
        |         CAST(sum(CASE WHEN o_orderpriority IS NULL
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_prio,
        |         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |           AS v_unique
        |  FROM orders
        |), fk AS (
        |  SELECT CAST(count(*) AS BIGINT) AS v_fk
        |  FROM orders
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |), rules AS (
        |  SELECT 'fk_custkey_exists' AS rule, n, v_fk AS v FROM base, fk
        |  UNION ALL SELECT 'orderdate_in_range', n, v_date FROM base
        |  UNION ALL SELECT 'orderkey_unique', n, v_unique FROM base
        |  UNION ALL SELECT 'priority_complete', n, v_prio FROM base
        |  UNION ALL SELECT 'status_in_domain', n, v_status FROM base
        |  UNION ALL SELECT 'totalprice_positive', n, v_price FROM base
        |)
        |SELECT rule, n AS n_rows, v AS n_violations, v = 0 AS passed
        |FROM rules ORDER BY rule""".stripMargin,

    // Single-window midrank replay; identical doubled-rank integer
    // arithmetic (m2 = 2·c_before + t + 1), 1-row exact output.
    "stat_mannwhitney" ->
      """WITH ev AS (
        |  SELECT value, user_id % 2 AS side
        |  FROM events WHERE value IS NOT NULL
        |), pts AS (
        |  SELECT value,
        |         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b
        |  FROM ev GROUP BY value
        |), r AS (
        |  SELECT a, b, a + b AS t,
        |         CAST(coalesce(sum(a + b) OVER (ORDER BY value
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |              0) AS BIGINT) AS cb4
        |  FROM pts
        |), agg AS (
        |  SELECT CAST(sum(a * (2 * cb4 + t + 1)) AS BIGINT) AS r2_a,
        |         CAST(sum(a) AS BIGINT) AS n1,
        |         CAST(sum(b) AS BIGINT) AS n2,
        |         CAST(sum(t * t * t - t) AS BIGINT) AS tie_t
        |  FROM r
        |)
        |SELECT r2_a, r2_a - n1 * (n1 + 1) AS u2_a, n1, n2, tie_t
        |FROM agg""".stripMargin,

    // Classic Q2 correlated-min subquery over the shared psCatalog CTE
    // (the lineitem-derived partsupp stand-in — identical derivation
    // to the Spark side's psCatalog); identity 2-dp renders, total
    // tie-break order under the LIMIT.
    "tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT))
        |              AS BIGINT) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2
        |), eu AS (
        |  SELECT s_suppkey, s_name, n_name,
        |         CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM supplier, nation, region
        |  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |    AND r_name = 'EUROPE'
        |)
        |SELECT round(bal_cents / 1e2, 2) AS s_acctbal, s_name, n_name,
        |       p_partkey, p_name, round(cost_cents / 1e2, 2) AS supplycost
        |FROM ps JOIN eu ON ps_suppkey = s_suppkey
        |        JOIN part ON ps_partkey = p_partkey
        |WHERE p_type = 'LARGE' AND p_size = 4
        |  AND cost_cents = (
        |    SELECT min(ps2.cost_cents)
        |    FROM ps ps2 JOIN eu eu2 ON ps2.ps_suppkey = eu2.s_suppkey
        |    WHERE ps2.ps_partkey = ps.ps_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    // Classic Q4 EXISTS formulation; lateness adapted to
    // shipdate-vs-orderdate (no commit/receipt dates in the fixture).
    "tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Classic Q9 catalog-join profit; supply cost from the shared
    // psCatalog CTE's floor-milli unit price (identical floor
    // spelling — round() on this quotient would be halfway-unsafe);
    // the 4-dp render is identity (revenue 4-dp minus cost 3-dp).
    "tpch_q9" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         CAST(min(CAST(floor(l_extendedprice * 1000 / l_quantity)
        |                       AS BIGINT)) AS BIGINT) AS unit_milli
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT n_name AS nation,
        |       CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       round(CAST(sum(
        |           CAST(round(l_extendedprice * (1 - l_discount) * 1e6)
        |                AS BIGINT)
        |           - unit_milli * CAST(l_quantity AS BIGINT) * 1000)
        |         AS BIGINT) / 1e6, 4) AS sum_profit
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    // Classic Q11 group-by + HAVING-over-global-scalar; the threshold
    // is mean-relative (value > 3× the mean part's — the spec's fixed
    // fraction empties at scale) as an exact integer
    // cross-multiplication.
    "tpch_q11" ->
      """WITH pp AS (
        |  SELECT l_partkey AS ps_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |              AS BIGINT) AS value_cents
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_7'
        |  GROUP BY 1
        |)
        |SELECT ps_partkey, round(value_cents / 1e2, 2) AS value
        |FROM pp
        |WHERE value_cents * (SELECT CAST(count(*) AS BIGINT) FROM pp)
        |      > 3 * (SELECT CAST(sum(value_cents) AS BIGINT) FROM pp)
        |ORDER BY value DESC, ps_partkey""".stripMargin,

    // Classic Q12 CASE-split counts; returnflag carries the absent
    // shipmode, lateness adapted as in tpch_q4.
    "tpch_q12" ->
      """SELECT l_returnflag AS l_shipmode,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT)
        |         AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1
        |ORDER BY l_shipmode""".stripMargin,

    // Classic Q16 distinct-supplier counts over the psCatalog pair
    // relation; the s_acctbal < 0 blacklist stands in for the spec's
    // complaints LIKE (documented adaptation).
    "tpch_q16" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        |  FROM lineitem
        |)
        |SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 2, 3, 4, 5, 8, 9)
        |  AND ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // Classic Q20 nested-aggregate IN; dominance as the exact
    // 2·supp_qty > part_qty cross-multiplication.
    "tpch_q20" ->
      """WITH rp AS (
        |  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        |), sq AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
        |  FROM lineitem JOIN rp ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2
        |), pq AS (
        |  SELECT l_partkey AS pk, CAST(sum(supp_qty) AS BIGINT) AS part_qty
        |  FROM sq GROUP BY 1
        |)
        |SELECT s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM sq JOIN pq ON l_partkey = pk
        |    WHERE supp_qty * 2 > part_qty)
        |ORDER BY s_name""".stripMargin,

    // Classic Q21 double-EXISTS formulation — an INDEPENDENT
    // derivation of the Spark side's single-scan per-order aggregate
    // rewrite (green certifies the rewrite against the textbook
    // correlation semantics, not a replay). Lateness adapted as in
    // tpch_q4; l1 LINES are counted, matching the spec.
    "tpch_q21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, nation, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    // Recompute-equals-maintain: the oracle aggregates a FULL replay of
    // the post-merge state; green certifies the signed-delta
    // maintenance (insert/delete/update retractions) reaches the same
    // aggregate without rescanning the table.
    "agg_retract" ->
      """WITH base AS (
        |  SELECT event_id, event_type, user_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_id % 3 <> 0
        |), chg AS (
        |  SELECT event_id, event_type, user_id,
        |         CASE WHEN event_id % 6 = 1
        |              THEN CAST(round(value * 100) AS BIGINT) * 2
        |              ELSE CAST(round(value * 100) AS BIGINT) END AS cents,
        |         CASE WHEN event_id % 3 = 0 THEN 'I'
        |              WHEN event_id % 6 = 1 THEN 'U'
        |              WHEN event_id % 6 = 4 THEN 'D' END AS op
        |  FROM events
        |  WHERE event_type IN ('click', 'view')
        |    AND (event_id % 3 = 0 OR event_id % 6 = 1 OR event_id % 6 = 4)
        |), final AS (
        |  SELECT b.event_type,
        |         CASE WHEN c.op = 'U' THEN c.cents ELSE b.cents END AS cents
        |  FROM base b LEFT JOIN chg c ON b.event_id = c.event_id
        |  WHERE c.op IS NULL OR c.op = 'U'
        |  UNION ALL
        |  SELECT event_type, cents FROM chg WHERE op = 'I'
        |)
        |SELECT event_type,
        |       CAST(sum(cents) AS BIGINT) AS cents_total,
        |       count(*) AS n_live
        |FROM final
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // Same md5 bucket fold as text_hashing_vec; integer weights and
    // counts make the logit exact, so the keep cutoff cannot flap.
    "quality_logit" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ')) AS term
        |  FROM documents
        |), b AS (
        |  SELECT doc_id,
        |         CAST('0x' || substring(md5(term), 1, 6) AS BIGINT)
        |           % 64 AS b
        |  FROM tok
        |), c AS (
        |  SELECT doc_id, b, count(*) AS n FROM b GROUP BY doc_id, b
        |)
        |SELECT doc_id,
        |       CAST(sum(n * ((b * 2654435761) % 1001 - 500)) AS BIGINT)
        |         AS logit,
        |       CAST(sum(n * ((b * 2654435761) % 1001 - 500)) AS BIGINT) > 0
        |         AS keep
        |FROM c
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Identical union-timeline + two window passes; IGNORE NULLS
    // last/first; null-coalesced sort keys (Spark NULLS FIRST vs
    // DuckDB NULLS LAST); exact integer-µs distances.
    "join_asof_nearest" ->
      """WITH u AS (
        |  SELECT CAST(NULL AS BIGINT) AS event_id, o_custkey AS uid,
        |         o_orderdate AS t, o_orderkey AS o_key,
        |         epoch_us(o_orderdate) AS ot_us, 0 AS kind
        |  FROM orders
        |  UNION ALL
        |  SELECT event_id, user_id, ts - INTERVAL 26 YEARS,
        |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 1
        |  FROM events
        |), w AS (
        |  SELECT event_id, kind, epoch_us(t) AS pt_us,
        |         last_value(o_key IGNORE NULLS) OVER wb AS bk,
        |         last_value(ot_us IGNORE NULLS) OVER wb AS bt,
        |         first_value(o_key IGNORE NULLS) OVER wf AS fk,
        |         first_value(ot_us IGNORE NULLS) OVER wf AS ft
        |  FROM u
        |  WINDOW
        |    wb AS (PARTITION BY uid
        |           ORDER BY t, kind, COALESCE(o_key, -1),
        |                    COALESCE(event_id, -1)
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY uid
        |           ORDER BY t, kind, COALESCE(o_key, -1),
        |                    COALESCE(event_id, -1)
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT event_id,
        |       COALESCE(CASE WHEN bk IS NULL THEN fk
        |                     WHEN fk IS NULL THEN bk
        |                     WHEN ft - pt_us < pt_us - bt THEN fk
        |                     ELSE bk END, -1) AS matched_order,
        |       COALESCE(CASE WHEN bk IS NULL THEN ft - pt_us
        |                     WHEN fk IS NULL THEN pt_us - bt
        |                     ELSE least(pt_us - bt, ft - pt_us) END, -1)
        |         AS dist_us
        |FROM w
        |WHERE kind = 1
        |ORDER BY event_id""".stripMargin,

    // The join order is the optimizer's business — the oracle writes
    // the natural chain; a green hash certifies the reordered plan
    // computes the same relation.
    "cbo_reorder" ->
      """SELECT n_name, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // The variable's value is a particular row's exact 2-decimal
    // double, replayed as an inline scalar subquery.
    "sql_variables" ->
      """WITH cut AS (
        |  SELECT o_totalprice AS c FROM orders WHERE o_orderkey = 1234
        |)
        |SELECT o_orderpriority, count(*) AS n_top,
        |       CAST(min(round(o_totalprice * 100)) AS BIGINT) AS min_cents
        |FROM orders, cut
        |WHERE o_totalprice > cut.c
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Bag semantics replayed with DuckDB's own EXCEPT ALL /
    // INTERSECT ALL; per-value multiplicities aggregated identically.
    "set_multiset" ->
      """WITH l AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |), r AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000.0
        |)
        |SELECT 'except_all' AS tag, custkey, count(*) AS n
        |FROM (SELECT custkey FROM l EXCEPT ALL SELECT custkey FROM r)
        |GROUP BY custkey
        |UNION ALL
        |SELECT 'intersect_all', custkey, count(*)
        |FROM (SELECT custkey FROM l INTERSECT ALL SELECT custkey FROM r)
        |GROUP BY custkey
        |ORDER BY tag, custkey""".stripMargin,

    // Per-nation top-3 by balance, rank filter replayed; tie-break on
    // custkey makes the cut deterministic.
    "win_top_per_group" ->
      """SELECT c_custkey, c_nationkey,
        |       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents, rn
        |FROM (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |         CAST(row_number() OVER (PARTITION BY c_nationkey
        |             ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        |  FROM customer
        |)
        |WHERE rn <= 3
        |ORDER BY c_nationkey, rn""".stripMargin,

    // TPC-H Q1 pricing summary: all money summed in exact integer
    // units (cents / micro-units — price·(1−disc)·(1+tax) has ≤ 6 dp,
    // so round(·×1e6) is an exact integer), every average rendered
    // once from the exact sums; sums CAST AS BIGINT against DuckDB's
    // HUGEINT widening.
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |                  AS BIGINT) / 1e2, 2) AS sum_base_price,
        |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                                 * 1e6) AS BIGINT))
        |                  AS BIGINT) / 1e6, 4) AS sum_disc_price,
        |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                                 * (1 + l_tax) * 1e6) AS BIGINT))
        |                  AS BIGINT) / 1e6, 4) AS sum_charge,
        |       round(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |             / CAST(count(*) AS DOUBLE), 4) AS avg_qty,
        |       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |                  AS BIGINT) / 1e2 / count(*), 4) AS avg_price,
        |       round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT))
        |                  AS BIGINT) / 1e2 / count(*), 4) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // SQL-standard regr_* family exists in both engines with the same
    // (y, x) argument order and single-pass stable moment algebra;
    // model outputs rounded to 4dp, count pinned BIGINT.
    "agg_regression" ->
      """SELECT l_returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4)
        |         AS intercept,
        |       round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
        |         AS n_pairs,
        |       round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
        |       round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Multiple exact COUNT(DISTINCT) + plain aggregates in one pass;
    // all counts pinned BIGINT (DuckDB count already is), qty sum
    // CAST against HUGEINT widening.
    "agg_multi_distinct" ->
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nd_order,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // The pipe chain is parser sugar over exactly this classic form —
    // the oracle replays it in ANSI syntax; exact-cents money, the
    // revenue rendered once from the BIGINT sum.
    "sql_pipe" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                  AS BIGINT) / 1e2, 2) AS revenue
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // The _metadata.row_index contract stated engine-independently:
    // a dense 0..n-1 enumeration per file (min 0, max n-1, n distinct
    // ordinals), n computed by the oracle from the same table; the
    // fixture is the single file documents.parquet. Per-row restart/
    // attribution semantics over a multi-file dataset are pinned in
    // SourcesSpec (no portable SQL exists for another engine's hidden
    // metadata columns).
    "scan_file_metadata" ->
      """SELECT 'documents.parquet' AS file_name,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(0 AS BIGINT) AS min_idx,
        |       CAST(count(*) - 1 AS BIGINT) AS max_idx,
        |       CAST(count(*) AS BIGINT) AS nd_idx,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS nd_doc
        |FROM documents""".stripMargin,

    // Weighted mean + Kish n_eff from three exact BIGINT moment sums;
    // every division sequence written identically to the Spark render
    // (single IEEE ops over exactly-representable ints), sums CAST
    // against HUGEINT widening.
    "agg_weighted" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_w,
        |       round(CAST(sum(CAST(l_quantity AS BIGINT) *
        |                      CAST(round(l_extendedprice * 100) AS BIGINT))
        |                  AS BIGINT) / 1e2
        |             / CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT), 4)
        |         AS wavg_price,
        |       round(CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) *
        |                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |                  AS DOUBLE)
        |             / CAST(CAST(sum(CAST(l_quantity AS BIGINT) *
        |                             CAST(l_quantity AS BIGINT)) AS BIGINT)
        |                    AS DOUBLE), 4) AS n_eff
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // The same 5-band [lo, hi) dimension inlined as VALUES; exact
    // 2-dec boundaries vs exact 2-dec prices — the band cut cannot
    // flip cross-engine; exact cents.
    "join_band_bnlj" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('B1_micro', 0.0, 50000.0),
        |  ('B2_small', 50000.0, 100000.0),
        |  ('B3_mid', 100000.0, 200000.0),
        |  ('B4_large', 200000.0, 300000.0),
        |  ('B5_jumbo', 300000.0, 1.0e18))
        |SELECT band,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                  AS BIGINT) / 1e2, 2) AS revenue
        |FROM orders
        |JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band
        |ORDER BY band""".stripMargin,
    "agg_countmin" -> countMinOracle,
    "rank_rrf" -> rankRrfOracle,

    // Six exact BIGINT conditional moments, then the SAME scalar IEEE
    // expression tree (identical op order/parenthesization — the
    // agg_weighted division-sequence rule); renders are floor(x*1e6),
    // never round() on a non-decimal quotient.
    "stat_ttest" ->
      """WITH mo AS (
        |  SELECT
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n2,
        |    sum(CASE WHEN user_id % 2 = 0
        |             THEN CAST(round(value * 100) AS BIGINT)
        |             ELSE 0 END) AS s1,
        |    sum(CASE WHEN user_id % 2 = 1
        |             THEN CAST(round(value * 100) AS BIGINT)
        |             ELSE 0 END) AS s2,
        |    sum(CASE WHEN user_id % 2 = 0
        |             THEN CAST(round(value * 100) AS BIGINT)
        |                  * CAST(round(value * 100) AS BIGINT)
        |             ELSE 0 END) AS q1,
        |    sum(CASE WHEN user_id % 2 = 1
        |             THEN CAST(round(value * 100) AS BIGINT)
        |                  * CAST(round(value * 100) AS BIGINT)
        |             ELSE 0 END) AS q2
        |  FROM events WHERE value IS NOT NULL
        |), sc AS (
        |  SELECT n1, n2, s1, s2, q1, q2,
        |         CAST(n1 AS DOUBLE) AS nd1, CAST(n2 AS DOUBLE) AS nd2,
        |         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2
        |  FROM mo
        |), vv AS (
        |  SELECT *,
        |         ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * m1)
        |            / (nd1 - 1.0)) / nd1 AS u1,
        |         ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * m2)
        |            / (nd2 - 1.0)) / nd2 AS u2
        |  FROM sc
        |)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |       CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
        |       CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
        |       CAST(floor((m1 - m2) / sqrt(u1 + u2) * 1e6) AS BIGINT)
        |         AS t_micro,
        |       CAST(floor((u1 + u2) * (u1 + u2)
        |              / (u1 * u1 / (nd1 - 1.0) + u2 * u2 / (nd2 - 1.0))
        |              * 1e6) AS BIGINT) AS df_micro
        |FROM vv""".stripMargin,

    // Same quality ranking + md5 qrel draw; metrics are exact integer
    // floor divisions so recall/MRR can never tie-flap cross-engine.
    // Discount weights/prefix sums are round(1e9/log2(k+1)) BIGINT
    // literals identical in both engines — no libm call anywhere;
    // DCG/IDCG/ndcg_micro are exact integer arithmetic.
    "eval_bleu" ->
      """WITH pairs AS (
        |  SELECT c.doc_id AS pid, c.lang, c.text AS ctext, r.text AS rtext
        |  FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
        |  WHERE c.doc_id % 2 = 0
        |), ctoks AS (
        |  SELECT pid,
        |         unnest(string_split_regex(trim(lower(ctext)), '\s+')) AS tok,
        |         generate_subscripts(
        |           string_split_regex(trim(lower(ctext)), '\s+'), 1) AS pos
        |  FROM pairs
        |), rtoks AS (
        |  SELECT pid,
        |         unnest(string_split_regex(trim(lower(rtext)), '\s+')) AS tok,
        |         generate_subscripts(
        |           string_split_regex(trim(lower(rtext)), '\s+'), 1) AS pos
        |  FROM pairs
        |), cg AS (
        |  SELECT pid, g, count(*) AS cc FROM (
        |    SELECT pid, tok AS g FROM ctoks
        |    UNION ALL
        |    SELECT pid, tok || ' ' ||
        |           lead(tok) OVER (PARTITION BY pid ORDER BY pos) AS g
        |    FROM ctoks QUALIFY g IS NOT NULL
        |  ) GROUP BY 1, 2
        |), rg AS (
        |  SELECT pid, g, count(*) AS rc FROM (
        |    SELECT pid, tok AS g FROM rtoks
        |    UNION ALL
        |    SELECT pid, tok || ' ' ||
        |           lead(tok) OVER (PARTITION BY pid ORDER BY pos) AS g
        |    FROM rtoks QUALIFY g IS NOT NULL
        |  ) GROUP BY 1, 2
        |), tot AS (
        |  SELECT pid,
        |    sum(CASE WHEN instr(g, ' ') = 0 THEN cc ELSE 0 END) AS tot1,
        |    sum(CASE WHEN instr(g, ' ') > 0 THEN cc ELSE 0 END) AS tot2
        |  FROM cg GROUP BY 1
        |), mat AS (
        |  SELECT cg.pid,
        |    sum(CASE WHEN instr(cg.g, ' ') = 0
        |             THEN least(cg.cc, rg.rc) ELSE 0 END) AS m1,
        |    sum(CASE WHEN instr(cg.g, ' ') > 0
        |             THEN least(cg.cc, rg.rc) ELSE 0 END) AS m2
        |  FROM cg JOIN rg ON cg.pid = rg.pid AND cg.g = rg.g
        |  GROUP BY 1
        |), rtot AS (
        |  SELECT pid,
        |    sum(CASE WHEN instr(g, ' ') = 0 THEN rc ELSE 0 END) AS rtot1,
        |    sum(CASE WHEN instr(g, ' ') > 0 THEN rc ELSE 0 END) AS rtot2
        |  FROM rg GROUP BY 1
        |), lens AS (
        |  SELECT pid, lang,
        |    CAST(len(string_split_regex(trim(lower(ctext)), '\s+'))
        |         AS BIGINT) AS clen,
        |    CAST(len(string_split_regex(trim(lower(rtext)), '\s+'))
        |         AS BIGINT) AS rlen
        |  FROM pairs
        |), pooled AS (
        |  -- JOIN rtot mirrors the shared Spark genPairPooled, which
        |  -- inner-joins the reference-gram totals for BLEU and ROUGE
        |  -- alike (ADVICE r15): a pair whose reference produced zero
        |  -- grams must be dropped by BOTH engines. (Empty strings
        |  -- tokenize to [''] on both, so the stream is never actually
        |  -- empty on this corpus — the join pins the semantics, it
        |  -- does not change current rows.)
        |  SELECT lang, count(*) AS n_pairs,
        |    CAST(sum(coalesce(m1, 0)) AS BIGINT) AS match1,
        |    CAST(sum(tot1) AS BIGINT) AS total1,
        |    CAST(sum(coalesce(m2, 0)) AS BIGINT) AS match2,
        |    CAST(sum(tot2) AS BIGINT) AS total2,
        |    CAST(sum(clen) AS BIGINT) AS c_len,
        |    CAST(sum(rlen) AS BIGINT) AS r_len
        |  FROM lens JOIN tot USING (pid) JOIN rtot USING (pid)
        |       LEFT JOIN mat USING (pid)
        |  GROUP BY 1
        |)
        |SELECT lang, n_pairs, match1, total1, match2, total2, c_len, r_len,
        |  CAST((1000000 * match1) // nullif(total1, 0) AS BIGINT) AS p1_micro,
        |  CAST((1000000 * match2) // nullif(total2, 0) AS BIGINT) AS p2_micro,
        |  CAST(floor(1e6 * sqrt(
        |    (CAST(match1 AS DOUBLE) / CAST(nullif(total1, 0) AS DOUBLE)) *
        |    (CAST(match2 AS DOUBLE) / CAST(nullif(total2, 0) AS DOUBLE))
        |  )) AS BIGINT) AS bleu2_micro,
        |  CAST((1000000 * r_len) // nullif(c_len, 0) AS BIGINT)
        |    AS len_ratio_micro
        |FROM pooled ORDER BY lang""".stripMargin,

    "eval_rouge" ->
      """WITH pairs AS (
        |  SELECT c.doc_id AS pid, c.lang, c.text AS ctext, r.text AS rtext
        |  FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
        |  WHERE c.doc_id % 2 = 0
        |), ctoks AS (
        |  SELECT pid,
        |         unnest(string_split_regex(trim(lower(ctext)), '\s+')) AS tok,
        |         generate_subscripts(
        |           string_split_regex(trim(lower(ctext)), '\s+'), 1) AS pos
        |  FROM pairs
        |), rtoks AS (
        |  SELECT pid,
        |         unnest(string_split_regex(trim(lower(rtext)), '\s+')) AS tok,
        |         generate_subscripts(
        |           string_split_regex(trim(lower(rtext)), '\s+'), 1) AS pos
        |  FROM pairs
        |), cg AS (
        |  SELECT pid, g, count(*) AS cc FROM (
        |    SELECT pid, tok AS g FROM ctoks
        |    UNION ALL
        |    SELECT pid, tok || ' ' ||
        |           lead(tok) OVER (PARTITION BY pid ORDER BY pos) AS g
        |    FROM ctoks QUALIFY g IS NOT NULL
        |  ) GROUP BY 1, 2
        |), rg AS (
        |  SELECT pid, g, count(*) AS rc FROM (
        |    SELECT pid, tok AS g FROM rtoks
        |    UNION ALL
        |    SELECT pid, tok || ' ' ||
        |           lead(tok) OVER (PARTITION BY pid ORDER BY pos) AS g
        |    FROM rtoks QUALIFY g IS NOT NULL
        |  ) GROUP BY 1, 2
        |), tot AS (
        |  SELECT pid,
        |    sum(CASE WHEN instr(g, ' ') = 0 THEN cc ELSE 0 END) AS tot1,
        |    sum(CASE WHEN instr(g, ' ') > 0 THEN cc ELSE 0 END) AS tot2
        |  FROM cg GROUP BY 1
        |), rtot AS (
        |  SELECT pid,
        |    sum(CASE WHEN instr(g, ' ') = 0 THEN rc ELSE 0 END) AS rtot1,
        |    sum(CASE WHEN instr(g, ' ') > 0 THEN rc ELSE 0 END) AS rtot2
        |  FROM rg GROUP BY 1
        |), mat AS (
        |  SELECT cg.pid,
        |    sum(CASE WHEN instr(cg.g, ' ') = 0
        |             THEN least(cg.cc, rg.rc) ELSE 0 END) AS m1,
        |    sum(CASE WHEN instr(cg.g, ' ') > 0
        |             THEN least(cg.cc, rg.rc) ELSE 0 END) AS m2
        |  FROM cg JOIN rg ON cg.pid = rg.pid AND cg.g = rg.g
        |  GROUP BY 1
        |), pooled AS (
        |  SELECT lang, count(*) AS n_pairs,
        |    CAST(sum(coalesce(m1, 0)) AS BIGINT) AS match1,
        |    CAST(sum(tot1) AS BIGINT) AS total1,
        |    CAST(sum(rtot1) AS BIGINT) AS rtotal1,
        |    CAST(sum(coalesce(m2, 0)) AS BIGINT) AS match2,
        |    CAST(sum(tot2) AS BIGINT) AS total2,
        |    CAST(sum(rtot2) AS BIGINT) AS rtotal2
        |  FROM pairs JOIN tot USING (pid) JOIN rtot USING (pid)
        |       LEFT JOIN mat USING (pid)
        |  GROUP BY 1
        |)
        |SELECT lang, n_pairs, match1, rtotal1, match2, rtotal2,
        |  CAST((1000000 * match1) // nullif(rtotal1, 0) AS BIGINT)
        |    AS r1_micro,
        |  CAST((1000000 * match2) // nullif(rtotal2, 0) AS BIGINT)
        |    AS r2_micro,
        |  CAST((2000000 * match1) // nullif(total1 + rtotal1, 0) AS BIGINT)
        |    AS f1_micro,
        |  CAST((2000000 * match2) // nullif(total2 + rtotal2, 0) AS BIGINT)
        |    AS f2_micro
        |FROM pooled ORDER BY lang""".stripMargin,

    "eval_ndcg" ->
      """WITH base AS (
        |  SELECT doc_id, lang, n_chars,
        |         CASE WHEN CAST('0x' ||
        |                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |                AS BIGINT) < 4 THEN 1 ELSE 0 END AS rel,
        |         row_number() OVER
        |           (PARTITION BY lang
        |            ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents
        |), g AS (
        |  SELECT lang,
        |         CAST(sum(rel) AS BIGINT) AS n_rel,
        |         CAST(sum(rel * CASE rank
        |             WHEN 1 THEN 1000000000 WHEN 2 THEN 630929754
        |             WHEN 3 THEN 500000000 WHEN 4 THEN 430676558
        |             WHEN 5 THEN 386852807 WHEN 6 THEN 356207187
        |             WHEN 7 THEN 333333333 WHEN 8 THEN 315464877
        |             WHEN 9 THEN 301029996 WHEN 10 THEN 289064826
        |             ELSE 0 END) AS BIGINT) AS dcg_w
        |  FROM base GROUP BY lang
        |), i AS (
        |  SELECT lang, n_rel, dcg_w,
        |         CAST(CASE least(n_rel, 10)
        |             WHEN 1 THEN 1000000000 WHEN 2 THEN 1630929754
        |             WHEN 3 THEN 2130929754 WHEN 4 THEN 2561606312
        |             WHEN 5 THEN 2948459119 WHEN 6 THEN 3304666306
        |             WHEN 7 THEN 3637999639 WHEN 8 THEN 3953464516
        |             WHEN 9 THEN 4254494512 WHEN 10 THEN 4543559338
        |             END AS BIGINT) AS idcg_w
        |  FROM g
        |)
        |SELECT lang, n_rel, dcg_w, idcg_w,
        |       CAST((1000000 * dcg_w) // nullif(idcg_w, 0) AS BIGINT)
        |         AS ndcg_micro
        |FROM i
        |ORDER BY lang""".stripMargin,

    // Exact token_count whitespace convention; the cut compares exact
    // integer running sums to the literal per-lang budget.
    "corpus_budget_cut" ->
      """WITH t AS (
        |  SELECT doc_id, lang, n_chars,
        |         CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |              AS BIGINT) AS n_toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_toks,
        |         sum(n_toks) OVER (PARTITION BY lang
        |                           ORDER BY n_chars DESC, doc_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING
        |                           AND CURRENT ROW) AS cum_toks
        |  FROM t
        |)
        |SELECT doc_id, lang, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks
        |FROM c WHERE cum_toks <= 2000
        |ORDER BY lang, cum_toks""".stripMargin,

    "eval_retrieval" ->
      """WITH base AS (
        |  SELECT doc_id, lang, n_chars,
        |         CASE WHEN CAST('0x' ||
        |                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |                AS BIGINT) < 4 THEN 1 ELSE 0 END AS rel,
        |         row_number() OVER
        |           (PARTITION BY lang
        |            ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents
        |)
        |SELECT lang,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(rel) AS BIGINT) AS n_rel,
        |       CAST(min(CASE WHEN rel = 1 THEN rank END) AS BIGINT)
        |         AS first_rel_rank,
        |       CAST(1000000 // min(CASE WHEN rel = 1 THEN rank END)
        |            AS BIGINT) AS rr_micro,
        |       CAST(sum(CASE WHEN rank <= 10 THEN rel ELSE 0 END)
        |            AS BIGINT) AS hits_at10,
        |       CAST((1000000 * sum(CASE WHEN rank <= 10 THEN rel ELSE 0 END))
        |            // nullif(sum(rel), 0) AS BIGINT) AS recall_at10_micro
        |FROM base
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // Same doubled-midrank machinery as stat_mannwhitney (the global
    // cumulative replaces the two-level prefix — DuckDB's window is
    // single-node anyway); the one division happens once at the end
    // over exactly-representable integers, then floor(x*1e6).
    "eval_auc" ->
      """WITH ev AS (
        |  SELECT value,
        |         CASE WHEN CAST('0x' ||
        |                substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
        |                AS BIGINT) < 4 OR value >= 90.0
        |              THEN 1 ELSE 0 END AS pos
        |  FROM events WHERE value IS NOT NULL
        |), pts AS (
        |  SELECT value,
        |         CAST(sum(pos) AS BIGINT) AS a,
        |         CAST(sum(1 - pos) AS BIGINT) AS b
        |  FROM ev GROUP BY value
        |), r AS (
        |  SELECT a, b, a + b AS t,
        |         CAST(coalesce(sum(a + b) OVER (ORDER BY value
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |              0) AS BIGINT) AS cb4
        |  FROM pts
        |), agg AS (
        |  SELECT CAST(sum(a * (2 * cb4 + t + 1)) AS BIGINT) AS r2_pos,
        |         CAST(sum(a) AS BIGINT) AS n_pos,
        |         CAST(sum(b) AS BIGINT) AS n_neg,
        |         CAST(sum(t * t * t - t) AS BIGINT) AS tie_t
        |  FROM r
        |)
        |SELECT n_pos, n_neg,
        |       r2_pos - n_pos * (n_pos + 1) AS u2_pos, tie_t,
        |       CAST(floor(CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
        |              / (2.0 * CAST(n_pos AS DOUBLE)
        |                     * CAST(n_neg AS DOUBLE)) * 1e6)
        |            AS BIGINT) AS auc_micro
        |FROM agg""".stripMargin,

    // Identical md5 permutation rank + per-stratum count windows;
    // quota is exact BIGINT floor division clamped to [5, 200].
    "sample_stratified" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |         count(*) OVER (PARTITION BY lang) AS n_docs,
        |         row_number() OVER
        |           (PARTITION BY lang
        |            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents
        |), q AS (
        |  SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id,
        |         CAST(n_docs AS BIGINT) AS n_docs,
        |         greatest(5, least(200, n_docs // 20)) AS quota
        |  FROM w
        |)
        |SELECT lang, rk, doc_id, n_docs, CAST(quota AS BIGINT) AS quota
        |FROM q
        |WHERE rk <= quota
        |ORDER BY lang, rk""".stripMargin,

    // The grid is an EXECUTION strategy — the oracle contracts the
    // SEMANTICS (3 nearest within r=50 per probe, (dist2, b_id) tie
    // order) with the direct quadratic formulation + window; every
    // column is an exact integer (md5-hex-derived coordinates).
    "join_spatial_knn" ->
      """WITH pts AS (
        |  SELECT event_id,
        |         CAST('0x' || substring(md5('x:' || event_id), 1, 6)
        |              AS BIGINT) % 1000 AS x,
        |         CAST('0x' || substring(md5('y:' || event_id), 1, 6)
        |              AS BIGINT) % 1000 AS y
        |  FROM events
        |), cand AS (
        |  SELECT a.event_id AS a_id, b.event_id AS b_id,
        |         (a.x - b.x) * (a.x - b.x)
        |       + (a.y - b.y) * (a.y - b.y) AS dist2
        |  FROM pts a JOIN pts b
        |    ON a.event_id % 100 = 1 AND b.event_id % 100 = 2
        |   AND (a.x - b.x) * (a.x - b.x)
        |     + (a.y - b.y) * (a.y - b.y) <= 2500
        |), r AS (
        |  SELECT a_id, b_id, CAST(dist2 AS BIGINT) AS dist2,
        |         row_number() OVER
        |           (PARTITION BY a_id ORDER BY dist2, b_id) AS rank
        |  FROM cand
        |)
        |SELECT a_id, CAST(rank AS BIGINT) AS rank, b_id, dist2
        |FROM r
        |WHERE rank <= 3
        |ORDER BY a_id, rank""".stripMargin,

    // All-integer: bin = p_milli div 100 over the same two md5 milli
    // draws; renders are exact BIGINT floor divisions.
    "eval_calibration" ->
      """WITH d AS (
        |  SELECT CAST('0x' || substring(md5('p:' || event_id), 1, 6)
        |              AS BIGINT) % 1000 AS p_milli,
        |         CAST('0x' || substring(md5('l:' || event_id), 1, 6)
        |              AS BIGINT) % 1000 AS l_milli
        |  FROM events
        |), b AS (
        |  SELECT p_milli // 100 AS bin, p_milli,
        |         CASE WHEN l_milli < p_milli THEN 1 ELSE 0 END AS pos
        |  FROM d
        |)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(pos) AS BIGINT) AS n_pos,
        |       CAST((1000 * sum(p_milli)) // count(*) AS BIGINT)
        |         AS avg_pred_micro,
        |       CAST((1000000 * sum(pos)) // count(*) AS BIGINT)
        |         AS frac_pos_micro
        |FROM b
        |GROUP BY bin
        |ORDER BY bin""".stripMargin,

    // Same six exact conditional moments per lag over the identical
    // (ts, event_id)-ordered lag chain; identical terminal IEEE tree,
    // zero-variance lags guarded by exact integer comparisons.
    "ts_autocorr" ->
      """WITH base AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c,
        |         lag(CAST(round(value * 100) AS BIGINT), 1) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS c1,
        |         lag(CAST(round(value * 100) AS BIGINT), 2) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS c2,
        |         lag(CAST(round(value * 100) AS BIGINT), 3) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS c3
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |), mo AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST(sum(CASE WHEN c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN c1 IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS sx1,
        |    CAST(sum(CASE WHEN c1 IS NOT NULL THEN c1 ELSE 0 END) AS BIGINT) AS sy1,
        |    CAST(sum(CASE WHEN c1 IS NOT NULL THEN c * c1 ELSE 0 END) AS BIGINT) AS sxy1,
        |    CAST(sum(CASE WHEN c1 IS NOT NULL THEN c * c ELSE 0 END) AS BIGINT) AS sxx1,
        |    CAST(sum(CASE WHEN c1 IS NOT NULL THEN c1 * c1 ELSE 0 END) AS BIGINT) AS syy1,
        |    CAST(sum(CASE WHEN c2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN c2 IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS sx2,
        |    CAST(sum(CASE WHEN c2 IS NOT NULL THEN c2 ELSE 0 END) AS BIGINT) AS sy2,
        |    CAST(sum(CASE WHEN c2 IS NOT NULL THEN c * c2 ELSE 0 END) AS BIGINT) AS sxy2,
        |    CAST(sum(CASE WHEN c2 IS NOT NULL THEN c * c ELSE 0 END) AS BIGINT) AS sxx2,
        |    CAST(sum(CASE WHEN c2 IS NOT NULL THEN c2 * c2 ELSE 0 END) AS BIGINT) AS syy2,
        |    CAST(sum(CASE WHEN c3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        |    CAST(sum(CASE WHEN c3 IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS sx3,
        |    CAST(sum(CASE WHEN c3 IS NOT NULL THEN c3 ELSE 0 END) AS BIGINT) AS sy3,
        |    CAST(sum(CASE WHEN c3 IS NOT NULL THEN c * c3 ELSE 0 END) AS BIGINT) AS sxy3,
        |    CAST(sum(CASE WHEN c3 IS NOT NULL THEN c * c ELSE 0 END) AS BIGINT) AS sxx3,
        |    CAST(sum(CASE WHEN c3 IS NOT NULL THEN c3 * c3 ELSE 0 END) AS BIGINT) AS syy3
        |  FROM base GROUP BY user_id
        |)
        |SELECT user_id, n_obs,
        |  CASE WHEN n1 * sxx1 - sx1 * sx1 > 0 AND n1 * syy1 - sy1 * sy1 > 0
        |       THEN CAST(floor(CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE)
        |              / sqrt(CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE)
        |                   * CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE))
        |              * 1e6) AS BIGINT) END AS r1_micro,
        |  CASE WHEN n2 * sxx2 - sx2 * sx2 > 0 AND n2 * syy2 - sy2 * sy2 > 0
        |       THEN CAST(floor(CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE)
        |              / sqrt(CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE)
        |                   * CAST(n2 * syy2 - sy2 * sy2 AS DOUBLE))
        |              * 1e6) AS BIGINT) END AS r2_micro,
        |  CASE WHEN n3 * sxx3 - sx3 * sx3 > 0 AND n3 * syy3 - sy3 * sy3 > 0
        |       THEN CAST(floor(CAST(n3 * sxy3 - sx3 * sy3 AS DOUBLE)
        |              / sqrt(CAST(n3 * sxx3 - sx3 * sx3 AS DOUBLE)
        |                   * CAST(n3 * syy3 - sy3 * sy3 AS DOUBLE))
        |              * 1e6) AS BIGINT) END AS r3_micro
        |FROM mo
        |WHERE n_obs >= 10
        |ORDER BY user_id""".stripMargin,

    // QI classes are an exact integer derivation; counts and ppm
    // renders exact BIGINTs.
    "dq_kanonymity" ->
      """WITH classes AS (
        |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) // 100000
        |           AS bal_band,
        |         count(*) AS class_size
        |  FROM customer
        |  GROUP BY 1, 2, 3
        |), tot AS (
        |  SELECT sum(class_size) AS n_total FROM classes
        |)
        |SELECT nation, segment, CAST(bal_band AS BIGINT) AS bal_band,
        |       CAST(class_size AS BIGINT) AS class_size,
        |       CAST((1000000 * class_size) // n_total AS BIGINT)
        |         AS risk_ppm
        |FROM classes, tot
        |WHERE class_size < 5
        |ORDER BY nation, segment, bal_band""".stripMargin,

    // Four conditional counts + exact-rational metric renders (F1's
    // harmonic mean simplifies to 2tp/(2tp+fp+fn) — an integer ratio).
    // Raw BIGINT power sums → HUGEINT denominator-cleared central
    // numerators (A,B,C) → n-free ratios g1=B/A^1.5 (A·sqrt(A), no
    // pow/libm), g2=C/A²−3, floor(1e6·x) render. Mirrors the Spark
    // DECIMAL(38,0) arithmetic exactly.
    "agg_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
        |         CAST(sum(CAST(l_quantity AS BIGINT)
        |                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
        |         CAST(sum(CAST(l_quantity AS BIGINT)
        |                  * CAST(l_quantity AS BIGINT)
        |                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
        |         CAST(sum(CAST(l_quantity AS BIGINT)
        |                  * CAST(l_quantity AS BIGINT)
        |                  * CAST(l_quantity AS BIGINT)
        |                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
        |  FROM lineitem GROUP BY l_returnflag
        |), h AS (
        |  SELECT l_returnflag, n, s1, s2, s3, s4,
        |         CAST(n AS HUGEINT) * CAST(s2 AS HUGEINT)
        |           - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) AS a,
        |         CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
        |             * CAST(s3 AS HUGEINT)
        |           - 3 * CAST(n AS HUGEINT) * CAST(s1 AS HUGEINT)
        |             * CAST(s2 AS HUGEINT)
        |           + 2 * CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
        |             * CAST(s1 AS HUGEINT) AS b,
        |         CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
        |             * CAST(n AS HUGEINT) * CAST(s4 AS HUGEINT)
        |           - 4 * CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
        |             * CAST(s1 AS HUGEINT) * CAST(s3 AS HUGEINT)
        |           + 6 * CAST(n AS HUGEINT) * CAST(s1 AS HUGEINT)
        |             * CAST(s1 AS HUGEINT) * CAST(s2 AS HUGEINT)
        |           - 3 * CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
        |             * CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) AS c
        |  FROM s
        |)
        |SELECT l_returnflag, n, s1, s2, s3, s4,
        |       CAST(floor(1e6 * CAST(b AS DOUBLE) /
        |            (CAST(nullif(a, 0) AS DOUBLE)
        |             * sqrt(CAST(nullif(a, 0) AS DOUBLE))))
        |            AS BIGINT) AS skew_micro,
        |       CAST(floor(1e6 * (CAST(c AS DOUBLE) /
        |            (CAST(nullif(a, 0) AS DOUBLE)
        |             * CAST(nullif(a, 0) AS DOUBLE)) - 3.0))
        |            AS BIGINT) AS kurt_micro
        |FROM h
        |ORDER BY l_returnflag""".stripMargin,

    // Planted parent deletions (modulo of the parent key) make the
    // orphan counts nonzero; anti-join replayed flat.
    "dq_referential" ->
      """WITH e1 AS (
        |  SELECT 'orders->customer' AS edge,
        |         CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child,
        |         CAST((SELECT count(*) FROM orders o
        |               WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                 WHERE c.c_custkey = o.o_custkey
        |                   AND c.c_custkey % 97 <> 0)) AS BIGINT)
        |           AS n_orphan
        |), e2 AS (
        |  SELECT 'lineitem->orders' AS edge,
        |         CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
        |         CAST((SELECT count(*) FROM lineitem l
        |               WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                 WHERE o.o_orderkey = l.l_orderkey
        |                   AND o.o_orderkey % 89 <> 0)) AS BIGINT)
        |           AS n_orphan
        |), e3 AS (
        |  SELECT 'lineitem->part' AS edge,
        |         CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
        |         CAST((SELECT count(*) FROM lineitem l
        |               WHERE NOT EXISTS (SELECT 1 FROM part p
        |                 WHERE p.p_partkey = l.l_partkey
        |                   AND p.p_partkey % 83 <> 0)) AS BIGINT)
        |           AS n_orphan
        |), u AS (
        |  SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |  UNION ALL SELECT * FROM e3
        |)
        |SELECT edge, n_child, n_orphan,
        |       CAST((1000000 * n_orphan) // n_child AS BIGINT)
        |         AS orphan_ppm
        |FROM u
        |ORDER BY edge""".stripMargin,

    // Per-user lag chain → bounded 5×5 pair agg → exact ppm
    // conditionals; identical window/order spec in both engines.
    "event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type, 1) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS prev_type
        |  FROM events
        |), cells AS (
        |  SELECT prev_type, event_type AS next_type,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE prev_type IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT prev_type, next_type, n,
        |       CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |         AS row_total,
        |       CAST((1000000 * n) //
        |            sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |         AS p_ppm
        |FROM cells
        |ORDER BY prev_type, next_type""".stripMargin,

    // κ = (N·Σdiag − Σ r_k·c_k) / (N² − Σ r_k·c_k), every term an
    // exact BIGINT; the Σ r_k·c_k term sums marginal products over the
    // (always-present) diagonal cells. Numerator positive by fixture
    // construction, so truncating and flooring division agree.
    "eval_kappa" ->
      """WITH r AS (
        |  SELECT
        |    CASE WHEN CAST('0x' || substring(md5('ka:' || event_id),
        |              1, 6) AS BIGINT) % 1000 < 100
        |         THEN CASE event_type
        |              WHEN 'click' THEN 'error'
        |              WHEN 'error' THEN 'purchase'
        |              WHEN 'purchase' THEN 'signup'
        |              WHEN 'signup' THEN 'view'
        |              ELSE 'click' END
        |         ELSE event_type END AS a,
        |    CASE WHEN CAST('0x' || substring(md5('kb:' || event_id),
        |              1, 6) AS BIGINT) % 1000 < 200
        |         THEN CASE event_type
        |              WHEN 'click' THEN 'error'
        |              WHEN 'error' THEN 'purchase'
        |              WHEN 'purchase' THEN 'signup'
        |              WHEN 'signup' THEN 'view'
        |              ELSE 'click' END
        |         ELSE event_type END AS b
        |  FROM events
        |), cells AS MATERIALIZED (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS c
        |  FROM r GROUP BY a, b
        |), ra AS (
        |  SELECT a AS k, sum(c) AS ra FROM cells GROUP BY a
        |), cb AS (
        |  SELECT b AS k, sum(c) AS cb FROM cells GROUP BY b
        |), pe AS (
        |  SELECT CAST(coalesce(sum(ra.ra * cb.cb), 0) AS BIGINT)
        |           AS pe_num
        |  FROM ra JOIN cb USING (k)
        |), g AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
        |           AS n_agree
        |  FROM cells
        |)
        |SELECT n, n_agree, pe_num,
        |       CAST((1000000 * (n * n_agree - pe_num)) //
        |            (n * n - pe_num) AS BIGINT) AS kappa_micro
        |FROM g, pe""".stripMargin,

    "eval_confusion" ->
      """WITH d AS (
        |  SELECT CASE WHEN CAST('0x' || substring(md5('p:' || event_id),
        |                    1, 6) AS BIGINT) % 1000 >= 500
        |              THEN 1 ELSE 0 END AS pred,
        |         CASE WHEN CAST('0x' || substring(md5('l:' || event_id),
        |                    1, 6) AS BIGINT) % 1000
        |               < CAST('0x' || substring(md5('p:' || event_id),
        |                    1, 6) AS BIGINT) % 1000
        |              THEN 1 ELSE 0 END AS label
        |  FROM events
        |), m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN pred = 1 AND label = 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN pred = 0 AND label = 1 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN pred = 0 AND label = 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS tn
        |  FROM d
        |)
        |SELECT tp, fp, fn, tn,
        |       CAST((1000000 * tp) // (tp + fp) AS BIGINT)
        |         AS precision_micro,
        |       CAST((1000000 * tp) // (tp + fn) AS BIGINT)
        |         AS recall_micro,
        |       CAST((2000000 * tp) // (2 * tp + fp + fn) AS BIGINT)
        |         AS f1_micro
        |FROM m""".stripMargin,

    // Identical md5 weight draws w in {0,1,2} per (replicate, row);
    // sums exact BIGINT, mean renders exact floor divisions.
    "stat_bootstrap" ->
      """WITH reps AS (
        |  SELECT b, CAST(round(e.value * 100) AS BIGINT) AS c,
        |         CAST('0x' || substring(md5(CAST(e.event_id AS VARCHAR)),
        |              b + 1, 3) AS BIGINT) % 3 AS w
        |  FROM events e
        |  CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS b)
        |  WHERE e.value IS NOT NULL
        |)
        |SELECT CAST(b AS BIGINT) AS b,
        |       CAST(sum(w) AS BIGINT) AS n_eff,
        |       CAST((1000000 * sum(w * c)) // sum(w) AS BIGINT)
        |         AS mean_micro
        |FROM reps
        |GROUP BY b
        |ORDER BY b""".stripMargin,

    // Bounded per-type range + exact floor-division render with a
    // nullif guard on degenerate ranges.
    "feat_minmax" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |), r AS (
        |  SELECT event_type, min(c) AS c_min, max(c) AS c_max
        |  FROM ev GROUP BY event_type
        |)
        |SELECT ev.event_id, ev.event_type, ev.c,
        |       CAST((1000000 * (ev.c - r.c_min))
        |            // nullif(r.c_max - r.c_min, 0) AS BIGINT)
        |         AS norm_micro
        |FROM ev JOIN r USING (event_type)
        |ORDER BY ev.event_id""".stripMargin,

    // Identical n-scaled CUSUM (n*prefix - t*S stays exact BIGINT);
    // argmax tie-break by smallest t is a total order.
    "ts_changepoint" ->
      """WITH base AS (
        |  SELECT user_id, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         CAST(row_number() OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS BIGINT) AS t,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS prefix,
        |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
        |           (PARTITION BY user_id) AS BIGINT) AS s
        |  FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL
        |), dev AS (
        |  SELECT user_id, event_id, t, n,
        |         n * prefix - t * s AS dev_scaled,
        |         row_number() OVER
        |           (PARTITION BY user_id
        |            ORDER BY abs(n * prefix - t * s) DESC, t) AS pick
        |  FROM base
        |)
        |SELECT user_id, n, t AS cp_t, event_id AS cp_event_id, dev_scaled
        |FROM dev
        |WHERE pick = 1 AND n >= 10
        |ORDER BY user_id""".stripMargin,

    // Same rows-before-current last(IGNORE NULLS) channel over the
    // (ts, event_id) timeline; bounded channel counts.
    "event_attribution" ->
      """WITH tl AS (
        |  SELECT event_type,
        |         last_value(CASE WHEN event_type IN
        |                      ('view', 'click', 'signup')
        |                    THEN event_type END IGNORE NULLS) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS channel
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |)
        |SELECT coalesce(channel, 'none') AS channel,
        |       CAST(count(*) AS BIGINT) AS n_purchases
        |FROM tl
        |WHERE event_type = 'purchase'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // The error column IS the md5 draw; MAE/bias by exact floor
    // division, RMSE's one sqrt on the IEEE quotient of exact ints.
    "eval_regression" ->
      """WITH e AS (
        |  SELECT CAST('0x' || substring(md5('e:' || event_id), 1, 6)
        |              AS BIGINT) % 1000 - 500 AS e
        |  FROM events WHERE value IS NOT NULL
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(abs(e)) AS BIGINT) AS sum_abs_err,
        |         CAST(sum(e) AS BIGINT) AS sum_err,
        |         CAST(sum(e * e) AS BIGINT) AS sum_sq_err
        |  FROM e
        |)
        |SELECT n, sum_abs_err, sum_err, sum_sq_err,
        |       CAST((1000 * sum_abs_err) // n AS BIGINT) AS mae_millicent,
        |       CAST((1000 * sum_err) // n AS BIGINT) AS bias_millicent,
        |       CAST(floor(sqrt(CAST(sum_sq_err AS DOUBLE)
        |                     / CAST(n AS DOUBLE)) * 1e3) AS BIGINT)
        |         AS rmse_millicent
        |FROM m""".stripMargin,

    // extract(dow) 0=Sunday matches Spark dayofweek-1 under the
    // pinned UTC session; means exact floor divisions, dev_ppm one
    // IEEE division of exact ints then floor.
    "ts_seasonal_profile" ->
      """WITH d AS (
        |  SELECT CAST(extract(dow FROM ts) AS BIGINT) AS dow,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |), b AS (
        |  SELECT dow, CAST(count(*) AS BIGINT) AS n_d,
        |         CAST(sum(c) AS BIGINT) AS s_d
        |  FROM d GROUP BY dow
        |), t AS (
        |  SELECT CAST(sum(n_d) AS BIGINT) AS n_tot,
        |         CAST(sum(s_d) AS BIGINT) AS s_tot
        |  FROM b
        |)
        |SELECT dow, n_d,
        |       CAST((1000000 * s_d) // n_d AS BIGINT) AS mean_microcent,
        |       CAST(floor(CAST(n_tot * s_d - n_d * s_tot AS DOUBLE)
        |              / CAST(n_d * s_tot AS DOUBLE) * 1e6) AS BIGINT)
        |         AS dev_ppm
        |FROM b, t
        |ORDER BY dow""".stripMargin,

    // All three association measures are exact BIGINT floor
    // divisions over the same distinct (user, item) frame.
    "assoc_rules" ->
      """WITH base AS (
        |  SELECT DISTINCT user_id, event_type
        |  FROM events WHERE event_type IS NOT NULL
        |), item_n AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_item
        |  FROM base GROUP BY event_type
        |), user_n AS (
        |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM base
        |), pairs AS (
        |  SELECT a.event_type AS it_a, b.event_type AS it_b,
        |         CAST(count(*) AS BIGINT) AS n_ab
        |  FROM base a JOIN base b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT it_a, it_b, n_ab,
        |       na.n_item AS n_a, nb.n_item AS n_b, n_users,
        |       CAST((1000000 * n_ab) // n_users AS BIGINT) AS support_ppm,
        |       CAST((1000000 * n_ab) // na.n_item AS BIGINT) AS conf_micro,
        |       CAST((1000000 * n_ab * n_users) // (na.n_item * nb.n_item)
        |            AS BIGINT) AS lift_micro
        |FROM pairs
        |JOIN item_n na ON it_a = na.event_type
        |JOIN item_n nb ON it_b = nb.event_type
        |CROSS JOIN user_n
        |ORDER BY it_a, it_b""".stripMargin,

    // Same bounded per-type (sum, count) + exact LOO floor-division
    // render; singleton categories null out via nullif.
    "feat_target_encode" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |), st AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS s_g,
        |         CAST(count(*) AS BIGINT) AS n_g
        |  FROM ev GROUP BY event_type
        |)
        |SELECT ev.event_id, ev.event_type, ev.c,
        |       CAST((1000000 * (st.s_g - ev.c)) // nullif(st.n_g - 1, 0)
        |            AS BIGINT) AS loo_mean_microcent
        |FROM ev JOIN st USING (event_type)
        |ORDER BY ev.event_id""".stripMargin,

    // One profile pass per column family; min/max rendered as exact
    // integer cents/keys, counts exact BIGINTs.
    "dq_profile" ->
      """WITH p AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS nn_key,
        |         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd_key,
        |         CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |         CAST(max(o_orderkey) AS BIGINT) AS max_key,
        |         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS nn_cust,
        |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
        |         CAST(min(o_custkey) AS BIGINT) AS min_cust,
        |         CAST(max(o_custkey) AS BIGINT) AS max_cust,
        |         CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS nn_price,
        |         CAST(count(DISTINCT CAST(round(o_totalprice * 100)
        |              AS BIGINT)) AS BIGINT) AS nd_price,
        |         CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
        |              AS BIGINT) AS min_price,
        |         CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
        |              AS BIGINT) AS max_price
        |  FROM orders
        |)
        |SELECT col_name, n AS n_rows, n_null, n_distinct, min_val, max_val
        |FROM p, (VALUES ('o_custkey'), ('o_orderkey'),
        |                ('o_totalprice_cents')) c(col_name),
        |LATERAL (SELECT
        |  CASE col_name WHEN 'o_custkey' THEN nn_cust
        |       WHEN 'o_orderkey' THEN nn_key ELSE nn_price END AS n_null,
        |  CASE col_name WHEN 'o_custkey' THEN nd_cust
        |       WHEN 'o_orderkey' THEN nd_key ELSE nd_price END AS n_distinct,
        |  CASE col_name WHEN 'o_custkey' THEN min_cust
        |       WHEN 'o_orderkey' THEN min_key ELSE min_price END AS min_val,
        |  CASE col_name WHEN 'o_custkey' THEN max_cust
        |       WHEN 'o_orderkey' THEN max_key ELSE max_price END AS max_val)
        |ORDER BY col_name""".stripMargin,

    // The whole five-stage flow replayed as chained CTEs in exact
    // epoch micros; rates and means exact floor divisions.
    "pipeline_events" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |), marked AS (
        |  SELECT user_id, event_id, event_type, us,
        |         CASE WHEN lag(us) OVER w IS NULL
        |                OR us - lag(us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), sid AS (
        |  SELECT user_id, event_type, us,
        |         sum(new_sess) OVER
        |           (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS sid
        |  FROM marked
        |), sess AS (
        |  SELECT user_id, sid,
        |         CAST(count(*) AS BIGINT) AS n_ev,
        |         (max(us) - min(us)) // 1000000 AS dur_sec,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS purch
        |  FROM sid GROUP BY user_id, sid
        |), users AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |         CAST(sum(purch) AS BIGINT) AS n_purchase_sessions,
        |         CAST(sum(dur_sec) AS BIGINT) AS sum_dur_sec
        |  FROM sess GROUP BY user_id
        |)
        |SELECT CAST((10 * n_purchase_sessions) // n_sessions AS BIGINT)
        |         AS purchase_decile,
        |       CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(n_sessions) AS BIGINT) AS n_sessions_total,
        |       CAST(sum(n_purchase_sessions) AS BIGINT)
        |         AS n_purchase_sessions,
        |       CAST((1000000 * sum(n_purchase_sessions))
        |            // sum(n_sessions) AS BIGINT) AS purchase_rate_ppm,
        |       CAST(sum(sum_dur_sec) // sum(n_sessions) AS BIGINT)
        |         AS mean_session_sec
        |FROM users
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // Same 4-dp-rounded full/prefix cosines ranked with the identical
    // (cosine DESC, cand_id) tie order; output is all-integer.
    "embed_matryoshka" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(sum(v*v)) AS n FROM e GROUP BY vec_id
        |), nrm16 AS (
        |  SELECT vec_id, sqrt(sum(v*v)) AS n FROM e
        |  WHERE pos <= 16 GROUP BY vec_id
        |), dots AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |         sum(p.v * c.v) AS dot,
        |         sum(CASE WHEN p.pos <= 16 THEN p.v * c.v ELSE 0 END)
        |           AS dot16
        |  FROM e p JOIN e c ON p.pos = c.pos
        |  WHERE p.vec_id < 10 AND p.vec_id <> c.vec_id
        |  GROUP BY 1, 2
        |), cos AS (
        |  SELECT probe_id, cand_id,
        |         round(dot / (np.n * nc.n), 4) AS cf,
        |         round(dot16 / (np16.n * nc16.n), 4) AS cp
        |  FROM dots
        |  JOIN nrm np ON probe_id = np.vec_id
        |  JOIN nrm nc ON cand_id = nc.vec_id
        |  JOIN nrm16 np16 ON probe_id = np16.vec_id
        |  JOIN nrm16 nc16 ON cand_id = nc16.vec_id
        |), ranked AS (
        |  SELECT probe_id, cand_id,
        |         row_number() OVER (PARTITION BY probe_id
        |                            ORDER BY cf DESC, cand_id) AS rf,
        |         row_number() OVER (PARTITION BY probe_id
        |                            ORDER BY cp DESC, cand_id) AS rp
        |  FROM cos
        |)
        |SELECT probe_id,
        |       CAST(sum(CASE WHEN rf <= 5 AND rp <= 5 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS overlap_at5,
        |       CAST(max(CASE WHEN rf = 1 AND rp = 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS top1_match
        |FROM ranked
        |GROUP BY probe_id
        |ORDER BY probe_id""".stripMargin,
    "graph_kcore" -> kcoreOracle,

    // Same (user, type)-partitioned lag chain in exact epoch micros;
    // mean by floor division; the doubled median midpoint is an exact
    // integer on both engines (the float dies before the hash).
    "ts_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id, event_type
        |            ORDER BY ts, event_id) AS gap
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n_gaps,
        |       CAST(min(gap) AS BIGINT) AS min_gap_us,
        |       CAST(max(gap) AS BIGINT) AS max_gap_us,
        |       CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_us,
        |       CAST(quantile_cont(gap, 0.5) * 2.0 AS BIGINT)
        |         AS p50_gap_us_x2
        |FROM g
        |WHERE gap IS NOT NULL
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // The Dedup.tokens whitespace contract replayed; the ratio is an
    // exact BIGINT floor division.
    "text_ttr" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)),
        |                      '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |)
        |SELECT doc_id,
        |       CAST(len(w) AS BIGINT) AS n_tok,
        |       CAST(len(list_distinct(w)) AS BIGINT) AS n_types,
        |       CAST((1000000 * len(list_distinct(w)))
        |            // nullif(len(w), 0) AS BIGINT) AS ttr_micro
        |FROM t
        |ORDER BY doc_id""".stripMargin,

    // N²-scaled binary Gini: gini_ppm = 10^6*2*n_pos*(N-n_pos) div N²
    // — exact BIGINT end-to-end.
    "stat_gini_impurity" ->
      """SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_pos,
        |       CAST((1000000 * 2
        |              * sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END)
        |              * (count(*) - sum(CASE WHEN value >= 50.0
        |                                THEN 1 ELSE 0 END)))
        |            // (count(*) * count(*)) AS BIGINT) AS gini_ppm
        |FROM events
        |WHERE value IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // Denominators cleared: z² > (5/2)² ⟺ 4·(n·c−S)² > 25·(n·Q−S²)
    // — an exact BIGINT inequality over the same ±10-row frame.
    "anomaly_rolling_z" ->
      """WITH b AS (
        |  SELECT user_id, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         CAST(count(*) OVER w AS BIGINT) AS n,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
        |              AS BIGINT) AS s,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)
        |                * CAST(round(value * 100) AS BIGINT)) OVER w
        |              AS BIGINT) AS q
        |  FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING)
        |)
        |SELECT user_id, event_id, c, n,
        |       n * c - s AS dev,
        |       n * q - s * s AS var_sc
        |FROM b
        |WHERE n >= 11
        |  AND 4 * (n * c - s) * (n * c - s) > 25 * (n * q - s * s)
        |ORDER BY user_id, event_id""".stripMargin,

    // One conditional-count pass (tp/fp per threshold) replayed via a
    // threshold dimension join; exact floor-division renders.
    "eval_pr_curve" ->
      """WITH d AS (
        |  SELECT CAST('0x' || substring(md5('p:' || event_id), 1, 6)
        |              AS BIGINT) % 1000 AS p_milli,
        |         CASE WHEN CAST('0x' || substring(md5('l:' || event_id),
        |                    1, 6) AS BIGINT) % 1000
        |               < CAST('0x' || substring(md5('p:' || event_id),
        |                    1, 6) AS BIGINT) % 1000
        |              THEN 1 ELSE 0 END AS label
        |  FROM events
        |), np AS (
        |  SELECT CAST(sum(label) AS BIGINT) AS n_pos FROM d
        |), t AS (
        |  SELECT unnest(generate_series(0, 9)) * 100 AS thr_milli
        |)
        |SELECT CAST(thr_milli AS BIGINT) AS thr_milli,
        |       CAST(sum(CASE WHEN p_milli >= thr_milli AND label = 1
        |                THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |       CAST(sum(CASE WHEN p_milli >= thr_milli AND label = 0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |       CAST((1000000 * sum(CASE WHEN p_milli >= thr_milli
        |                           AND label = 1 THEN 1 ELSE 0 END))
        |            // nullif(sum(CASE WHEN p_milli >= thr_milli
        |                          THEN 1 ELSE 0 END), 0) AS BIGINT)
        |         AS precision_micro,
        |       CAST((1000000 * sum(CASE WHEN p_milli >= thr_milli
        |                           AND label = 1 THEN 1 ELSE 0 END))
        |            // nullif(n_pos, 0) AS BIGINT) AS recall_micro
        |FROM d CROSS JOIN t CROSS JOIN np
        |GROUP BY thr_milli, n_pos
        |ORDER BY thr_milli""".stripMargin,

    // Leading digit of the exact cent integer via decimal string
    // rendering; counts and ppm shares exact BIGINTs.
    "stat_benford" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(round(value * 100) AS BIGINT)
        |              AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM events WHERE value IS NOT NULL
        |), c AS (
        |  SELECT digit, CAST(count(*) AS BIGINT) AS n
        |  FROM d WHERE digit >= 1 GROUP BY digit
        |), t AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM c
        |)
        |SELECT digit, n,
        |       CAST((1000000 * n) // n_tot AS BIGINT) AS share_ppm
        |FROM c, t
        |ORDER BY digit""".stripMargin,

    // Identical literal character classes in Java regex and RE2;
    // exact counts + floor division, integer-threshold flag.
    "text_code_detect" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST(length(text) AS BIGINT) AS n_chars,
        |         CAST(length(text)
        |            - length(regexp_replace(text, '[{};=()<>\[\]]', '', 'g'))
        |              AS BIGINT) AS n_sym,
        |         CAST(len(regexp_extract_all(text,
        |              '\b(def|return|import|class|void|int|function|var|const)\b'))
        |              AS BIGINT) AS n_kw
        |  FROM documents
        |)
        |SELECT doc_id, n_chars, n_sym, n_kw,
        |       CAST((1000 * n_sym) // nullif(n_chars, 0) AS BIGINT)
        |         AS sym_per_kchar,
        |       ((1000 * n_sym) // nullif(n_chars, 0) >= 40 OR n_kw >= 3)
        |         AS is_code
        |FROM b
        |ORDER BY doc_id""".stripMargin,

    // Same keep-all bar and exact 24-bit tail draw (10% =
    // 1677722/16777216); map-only replay.
    "sample_tiered" ->
      """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        |       CASE WHEN n_chars >= 800 THEN 'keep_all'
        |            ELSE 'tail_sampled' END AS regime
        |FROM documents
        |WHERE n_chars >= 800
        |   OR CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |           AS BIGINT) < 1677722
        |ORDER BY doc_id""".stripMargin,

    // The sign is the denominator-cleared exact comparison n*c > S;
    // runs from the identical lag chain; z once via the same IEEE
    // tree, floor-micro render, degenerate sign mixes null out.
    "stat_runs" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT))
        |              OVER (PARTITION BY user_id) AS BIGINT) AS s
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |), signs AS (
        |  SELECT user_id,
        |         CASE WHEN n * c > s THEN 1 ELSE 0 END AS pos,
        |         CASE WHEN lag(CASE WHEN n * c > s THEN 1 ELSE 0 END)
        |                OVER w IS NULL THEN 1
        |              WHEN lag(CASE WHEN n * c > s THEN 1 ELSE 0 END)
        |                OVER w <> CASE WHEN n * c > s THEN 1 ELSE 0 END
        |              THEN 1 ELSE 0 END AS chg
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(pos) AS BIGINT) AS a,
        |         CAST(sum(chg) AS BIGINT) AS n_runs
        |  FROM signs GROUP BY user_id
        |)
        |SELECT user_id, n, a, n_runs,
        |       CASE WHEN a > 0 AND a < n THEN
        |         CAST(floor((CAST(n_runs AS DOUBLE)
        |           - (1.0 + 2.0 * CAST(a AS DOUBLE) * (CAST(n AS DOUBLE)
        |              - CAST(a AS DOUBLE)) / CAST(n AS DOUBLE)))
        |           / sqrt(2.0 * CAST(a AS DOUBLE) * (CAST(n AS DOUBLE)
        |               - CAST(a AS DOUBLE))
        |             * (2.0 * CAST(a AS DOUBLE) * (CAST(n AS DOUBLE)
        |                 - CAST(a AS DOUBLE)) - CAST(n AS DOUBLE))
        |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |                * (CAST(n AS DOUBLE) - 1.0)))
        |           * 1e6) AS BIGINT) END AS z_micro
        |FROM agg
        |WHERE n >= 20
        |ORDER BY user_id""".stripMargin,
  )

  /** Additive Holt-Winters whole-trajectory replay: the same 3-state
    * α=β=γ=½ recursion as the operator's aggregate() fold, one
    * recursive-CTE iteration per series step, the 8 seasonal slots as
    * named columns updated through the IDENTICAL CASE spelling. */
  private def holtWintersOracle: String = {
    val sPrev = "(CASE (r.i % 8) " +
      (0 until 8).map(k => s"WHEN $k THEN r.s$k").mkString(" ") + " END)"
    val lNew = s"((CAST(s.c AS DOUBLE) - $sPrev) + (r.l + r.b)) / 2"
    val sFields = (0 until 8).map(k =>
      s"CASE WHEN r.i % 8 = $k THEN ((CAST(s.c AS DOUBLE) - ($lNew)) " +
        s"+ r.s$k) / 2 ELSE r.s$k END AS s$k").mkString(",\n       ")
    val zeros = (0 until 8).map(k => s"CAST(0.0 AS DOUBLE) AS s$k")
      .mkString(", ")
    def sAt(h: Int): String =
      "(CASE ((r.i + " + (h - 1) + ") % 8) " +
        (0 until 8).map(k => s"WHEN $k THEN r.s$k").mkString(" ") + " END)"
    s"""WITH RECURSIVE seq AS (
       |  SELECT user_id,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY ts, event_id) AS i,
       |         CAST(round(value * 100) AS BIGINT) AS c
       |  FROM events WHERE value IS NOT NULL AND user_id % 20 = 0
       |), nn AS (
       |  SELECT user_id, max(i) AS n FROM seq GROUP BY 1
       |), rec AS (
       |  SELECT user_id, i, CAST(c AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b,
       |         $zeros
       |  FROM seq WHERE i = 1
       |  UNION ALL
       |  SELECT r.user_id, s.i,
       |       $lNew AS l,
       |       ((($lNew) - r.l) / 2) + r.b / 2 AS b,
       |       $sFields
       |  FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
       |)
       |SELECT r.user_id, CAST(nn.n AS BIGINT) AS n,
       |       CAST(floor(1e6 * r.l) AS BIGINT) AS level_micro,
       |       CAST(floor(1e6 * r.b) AS BIGINT) AS trend_micro,
       |       CAST(floor(1e6 * (r.l + 1.0 * r.b + ${sAt(1)})) AS BIGINT)
       |         AS f1_micro,
       |       CAST(floor(1e6 * (r.l + 2.0 * r.b + ${sAt(2)})) AS BIGINT)
       |         AS f2_micro,
       |       CAST(floor(1e6 * (r.l + 3.0 * r.b + ${sAt(3)})) AS BIGINT)
       |         AS f3_micro
       |FROM rec r JOIN nn ON r.user_id = nn.user_id AND r.i = nn.n
       |ORDER BY r.user_id""".stripMargin
  }

  /** 3-round k-core peel (k = 2) over the same exact J ≥ 0.8 edge set,
    * unrolled as chained CTE stages (the pagerank multi-round-oracle
    * pattern); shared stages MATERIALIZED. */
  private def kcoreOracle: String = {
    val rounds = (1 to 3).map { i =>
      s""", a$i AS (
         |  SELECT u FROM e${i - 1} GROUP BY u HAVING count(*) >= 2
         |), e$i AS (
         |  SELECT e.u, e.v FROM e${i - 1} e
         |  JOIN a$i x ON e.u = x.u JOIN a$i y ON e.v = y.u
         |)""".stripMargin
    }.mkString
    """WITH toks AS (
      |  SELECT doc_id,
      |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
      |  FROM documents
      |), sh AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
      |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
      |  WHERE len(w) >= 5
      |), cnt AS (
      |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT doc_a, doc_b FROM inter
      |  JOIN cnt na ON doc_a = na.doc_id
      |  JOIN cnt nb ON doc_b = nb.doc_id
      |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
      |), e0 AS MATERIALIZED (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |)""".stripMargin + rounds +
    """
      |SELECT u AS doc_id, CAST(count(*) AS BIGINT) AS degree
      |FROM e3 GROUP BY u ORDER BY doc_id""".stripMargin
  }

  /** 5-iteration damped PageRank over the same exact J ≥ 0.8 pair set,
    * unrolled as chained CTEs (recursive CTEs cannot aggregate in the
    * recursive term); per-round round(·,12) mirrors the Spark side so
    * summation-order drift cannot accumulate. */
  private def pagerankOracle: String = {
    val rounds = (1 to 5).map { i =>
      s""", pr$i AS (
         |  SELECT e.v AS node, round(0.15/nn.n + 0.85*sum(p.pr/d.deg), 12) AS pr
         |  FROM edges e JOIN deg d ON e.u = d.u JOIN pr${i - 1} p ON e.u = p.node, nn
         |  GROUP BY e.v, nn.n
         |)""".stripMargin
    }.mkString
    """WITH toks AS (
      |  SELECT doc_id,
      |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
      |  FROM documents
      |), sh AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
      |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
      |  WHERE len(w) >= 5
      |), cnt AS (
      |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT doc_a, doc_b FROM inter
      |  JOIN cnt na ON doc_a = na.doc_id
      |  JOIN cnt nb ON doc_b = nb.doc_id
      |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
      |), edges AS MATERIALIZED (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs
      |), deg AS MATERIALIZED (
      |  SELECT u, count(*) AS deg FROM edges GROUP BY 1
      |), nn AS (
      |  SELECT count(*) AS n FROM deg
      |), pr0 AS (
      |  SELECT u AS node, 1.0/nn.n AS pr FROM deg, nn
      |)""".stripMargin + rounds +
    """
      |SELECT node AS doc_id, round(pr, 6) AS pagerank
      |FROM pr5 ORDER BY doc_id""".stripMargin
  }

  /** Shared by merge_into (batch) and stream_merge_cdc (streaming):
    * both contract exactly the flat replay of the merged state. */
  private def mergedStateOracle: String =
    """WITH base AS (
      |  SELECT event_id, event_type, user_id,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_id % 3 <> 0
      |), chg AS (
      |  SELECT event_id, event_type, user_id,
      |         CASE WHEN event_id % 6 = 1
      |              THEN CAST(round(value * 100) AS BIGINT) * 2
      |              ELSE CAST(round(value * 100) AS BIGINT) END AS cents,
      |         CASE WHEN event_id % 3 = 0 THEN 'I'
      |              WHEN event_id % 6 = 1 THEN 'U'
      |              WHEN event_id % 6 = 4 THEN 'D' END AS op
      |  FROM events
      |  WHERE event_type IN ('click', 'view')
      |    AND (event_id % 3 = 0 OR event_id % 6 = 1 OR event_id % 6 = 4)
      |)
      |SELECT * FROM (
      |  SELECT b.event_id, b.event_type, b.user_id,
      |         CASE WHEN c.op = 'U' THEN c.cents ELSE b.cents END AS cents
      |  FROM base b LEFT JOIN chg c ON b.event_id = c.event_id
      |  WHERE c.op IS NULL OR c.op = 'U'
      |  UNION ALL
      |  SELECT event_id, event_type, user_id, cents
      |  FROM chg WHERE op = 'I'
      |)
      |ORDER BY event_id""".stripMargin

  /** Shared by dedup_near and dedup_ngram: both contract exactly the
    * J ≥ 0.8 five-gram-shingle Jaccard pairs. */
  private def dedupPairsOracle: String =
      """WITH toks AS (
        |  SELECT doc_id,
        |         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
        |  FROM toks, LATERAL unnest(generate_series(1, len(w)-4)) t(i)
        |  WHERE len(w) >= 5
        |), cnt AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |       round(c * 1.0 / (na.n + nb.n - c), 4) AS jaccard
        |FROM inter
        |JOIN cnt na ON doc_a = na.doc_id
        |JOIN cnt nb ON doc_b = nb.doc_id
        |WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin

  // Identical md5-hex bucket arithmetic (d=3 rows × w=128), estimate
  // = min over the key's d counters; all-integer so the CMS
  // guarantee est ≥ exact is hash-checked via overcount.
  private def countMinOracle: String =
      """WITH d AS (SELECT * FROM (VALUES (0), (1), (2)) t(j)),
        |sk AS (
        |  SELECT j,
        |         CAST('0x' || substring(md5(j || ':' || user_id), 1, 6)
        |              AS BIGINT) % 128 AS b,
        |         count(*) AS cnt
        |  FROM events CROSS JOIN d
        |  GROUP BY 1, 2
        |), probes AS (
        |  SELECT user_id, count(*) AS exact_n
        |  FROM events WHERE user_id % 17 = 0 GROUP BY 1
        |), est AS (
        |  SELECT p.user_id, p.exact_n, min(s.cnt) AS cms_est
        |  FROM probes p CROSS JOIN d
        |  JOIN sk s ON s.j = d.j
        |   AND s.b = CAST('0x' || substring(md5(d.j || ':' || p.user_id),
        |                   1, 6) AS BIGINT) % 128
        |  GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(exact_n AS BIGINT) AS exact_n,
        |       CAST(cms_est AS BIGINT) AS cms_est,
        |       CAST(cms_est - exact_n AS BIGINT) AS overcount
        |FROM est
        |ORDER BY user_id""".stripMargin

  // Same two ranker windows + fused window replayed per lang; scores
  // are exact BIGINT floor divisions (1000000 // (60+rank)) so the
  // fused order and the top-10 cut are engine-identical.
  private def rankRrfOracle: String =
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER
        |           (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS ra,
        |         row_number() OVER
        |           (PARTITION BY lang
        |            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rb
        |  FROM documents
        |), s AS (
        |  SELECT lang, doc_id, ra, rb,
        |         1000000 // (60 + ra) + 1000000 // (60 + rb) AS score_micro
        |  FROM r
        |), f AS (
        |  SELECT lang, doc_id, ra, rb, score_micro,
        |         row_number() OVER
        |           (PARTITION BY lang
        |            ORDER BY score_micro DESC, doc_id) AS fused_rank
        |  FROM s
        |)
        |SELECT lang, CAST(fused_rank AS BIGINT) AS fused_rank, doc_id,
        |       CAST(ra AS BIGINT) AS rank_quality,
        |       CAST(rb AS BIGINT) AS rank_hash,
        |       CAST(score_micro AS BIGINT) AS score_micro
        |FROM f
        |WHERE fused_rank <= 10
        |ORDER BY lang, fused_rank""".stripMargin
}
