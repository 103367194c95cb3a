package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.cdc.{Changelog, Envelope, StreamingLatest}
import graft.llm.{EmbedLsh, IvfAnn, MinHash, SimHash, TextOps, VectorOps}
import graft.mm.MultiModal
import graft.rel.{FuncSurface, Relational, SqlSurface, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every key in `queries` is an implemented operator from SURVEY.md §2.2;
  * every key with a SQL twin appears in `oracleSql` (= graft.Oracle.sql).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference tutorial's own question: current keyed state after the
    * change stream (README.md:305-316) — latest-wins materialization. */
  def entry(spark: SparkSession): DataFrame =
    Changelog.latestState(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Group A — CDC semantics on `events`
    "cdc_op_classify"      -> ((s, d) => Changelog.opClassify(s, d)),
    "cdc_latest_state"     -> ((s, d) => Changelog.latestState(s, d)),
    "cdc_latest_state_del" -> ((s, d) => Changelog.latestStateWithDeletes(s, d)),
    "cdc_op_counts"        -> ((s, d) => Changelog.opCounts(s, d)),
    "cdc_key_routing"      -> ((s, d) => Changelog.keyRouting(s, d)),
    "cdc_stream_tumbling"  -> ((s, d) => Changelog.streamTumbling(s, d)),
    "cdc_stream_stateful"  -> ((s, d) => StreamingLatest.streamStateful(s, d)),
    "cdc_envelope_build"   -> ((s, d) => Envelope.envelopeBuild(s, d)),
    "cdc_snapshot_union"   -> ((s, d) => Changelog.snapshotUnion(s, d)),
    "cdc_json_roundtrip"   -> ((s, d) => Changelog.jsonRoundtrip(s, d)),
    "cdc_latest_state_salted" -> ((s, d) => Changelog.latestStateSalted(s, d)),
    "cdc_stream_windowed"  -> ((s, d) => StreamingLatest.streamWindowed(s, d)),
    "cdc_stream_dedup"     -> ((s, d) => StreamingLatest.streamDedup(s, d)),
    "cdc_stream_join"      -> ((s, d) => StreamingLatest.streamJoin(s, d)),
    "cdc_stream_sessionize" -> ((s, d) => StreamingLatest.streamSessionize(s, d)),
    "cdc_stream_static_join" -> ((s, d) => StreamingLatest.streamStaticJoin(s, d)),
    "join_asof_attribution" -> ((s, d) => Changelog.asofAttribution(s, d)),
    "cdc_sessionize"       -> ((s, d) => Changelog.sessionize(s, d)),
    "cdc_scd2_history"     -> ((s, d) => Changelog.scd2History(s, d)),
    "cdc_merge_upsert"     -> ((s, d) => Changelog.mergeUpsert(s, d)),
    // Group B — relational core
    "scan_filter_project"  -> ((s, d) => Relational.scanFilterProject(s, d)),
    "agg_pricing_summary"  -> ((s, d) => Relational.aggPricingSummary(s, d)),
    "join_broadcast"       -> ((s, d) => Relational.joinBroadcast(s, d)),
    "join_5way_revenue"    -> ((s, d) => Relational.join5WayRevenue(s, d)),
    "q5_local_supplier"    -> ((s, d) => Relational.q5LocalSupplier(s, d)),
    "join_semi"            -> ((s, d) => Relational.joinSemi(s, d)),
    "join_anti"            -> ((s, d) => Relational.joinAnti(s, d)),
    "join_outer_coalesce"  -> ((s, d) => Relational.joinOuterCoalesce(s, d)),
    "join_range_bucketed"  -> ((s, d) => Relational.joinRangeBucketed(s, d)),
    "join_salted_skew"     -> ((s, d) => Relational.joinSaltedSkew(s, d)),
    "join_null_safe"       -> ((s, d) => Relational.joinNullSafe(s, d)),
    "union_by_name_evolution" -> ((s, d) => Relational.unionByNameEvolution(s, d)),
    "agg_approx_percentile" -> ((s, d) => Relational.aggApproxPercentile(s, d)),
    "agg_bitwise"          -> ((s, d) => Relational.aggBitwise(s, d)),
    "map_type_ops"         -> ((s, d) => Relational.mapTypeOps(s, d)),
    "agg_histogram"        -> ((s, d) => Relational.aggHistogram(s, d)),
    "text_ngram_freq"      -> ((s, d) => TextOps.ngramFreq(s, d)),
    "explode_outer_tokens" -> ((s, d) => TextOps.explodeOuterTokens(s, d)),
    "sample_split_assign"  -> ((s, d) => TextOps.sampleSplitAssign(s, d)),
    "q3_shipping_priority" -> ((s, d) => Relational.q3ShippingPriority(s, d)),
    "q18_large_orders"     -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q10_returned_items"   -> ((s, d) => Relational.q10ReturnedItems(s, d)),
    "q6_forecast_revenue"  -> ((s, d) => TpchShapes.q6ForecastRevenue(s, d)),
    "q4_order_priority"    -> ((s, d) => TpchShapes.q4OrderPriority(s, d)),
    "q7_volume_shipping"   -> ((s, d) => TpchShapes.q7VolumeShipping(s, d)),
    "q8_market_share"      -> ((s, d) => TpchShapes.q8MarketShare(s, d)),
    "q9_product_profit"    -> ((s, d) => TpchShapes.q9ProductProfit(s, d)),
    "q12_priority_shipping" -> ((s, d) => TpchShapes.q12PriorityShipping(s, d)),
    "q13_order_counts"     -> ((s, d) => TpchShapes.q13OrderCounts(s, d)),
    "q14_promo_revenue"    -> ((s, d) => TpchShapes.q14PromoRevenue(s, d)),
    "q15_top_supplier"     -> ((s, d) => TpchShapes.q15TopSupplier(s, d)),
    "q17_small_qty_orders" -> ((s, d) => TpchShapes.q17SmallQtyOrders(s, d)),
    "q19_discounted_revenue" -> ((s, d) => TpchShapes.q19DiscountedRevenue(s, d)),
    "q22_idle_customers"   -> ((s, d) => TpchShapes.q22IdleCustomers(s, d)),
    "q2_min_cost_supplier" -> ((s, d) => TpchShapes.q2MinCostSupplier(s, d)),
    "q21_late_suppliers"   -> ((s, d) => TpchShapes.q21LateSuppliers(s, d)),
    "agg_regression"       -> ((s, d) => FuncSurface.aggRegression(s, d)),
    "string_pad_funcs"     -> ((s, d) => FuncSurface.stringPadFuncs(s, d)),
    "window_moving_avg"    -> ((s, d) => FuncSurface.windowMovingAvg(s, d)),
    "agg_count_distinct_multi" -> ((s, d) => FuncSurface.aggCountDistinctMulti(s, d)),
    "join_full_outer"      -> ((s, d) => FuncSurface.joinFullOuter(s, d)),
    "math_extended_funcs"  -> ((s, d) => FuncSurface.mathExtendedFuncs(s, d)),
    "set_ops_all"          -> ((s, d) => FuncSurface.setOpsAll(s, d)),
    "table_profile_stats"  -> ((s, d) => FuncSurface.tableProfileStats(s, d)),
    "sql_recursive_cte"    -> ((s, d) => SqlSurface.recursiveCte(s, d)),
    "join_lateral_topk"    -> ((s, d) => SqlSurface.lateralTopk(s, d)),
    "sort_limit_offset"    -> ((s, d) => SqlSurface.sortLimitOffset(s, d)),
    "text_vocab_ids"       -> ((s, d) => TextOps.vocabIds(s, d)),
    "sample_group_hash_topk" -> ((s, d) => TextOps.sampleGroupHashTopk(s, d)),
    "cond_null_funcs"      -> ((s, d) => FuncSurface.condNullFuncs(s, d)),
    "ts_format_funcs"      -> ((s, d) => FuncSurface.tsFormatFuncs(s, d)),
    "array_basic_ops"      -> ((s, d) => FuncSurface.arrayBasicOps(s, d)),
    "subquery_scalar"      -> ((s, d) => Relational.subqueryScalar(s, d)),
    "set_ops_intersect"    -> ((s, d) => Relational.setOpsIntersect(s, d)),
    "window_topk_group"    -> ((s, d) => Relational.windowTopkGroup(s, d)),
    "window_running_sum"   -> ((s, d) => Relational.windowRunningSum(s, d)),
    "window_lag_lead"      -> ((s, d) => Relational.windowLagLead(s, d)),
    "window_ntile_rank"    -> ((s, d) => Relational.windowNtileRank(s, d)),
    "window_range_days"    -> ((s, d) => Relational.windowRangeDays(s, d)),
    "window_first_last"    -> ((s, d) => Relational.windowFirstLast(s, d)),
    "agg_conditional"      -> ((s, d) => Relational.aggConditional(s, d)),
    "agg_min_max_by"       -> ((s, d) => Relational.aggMinMaxBy(s, d)),
    "join_cross_dims"      -> ((s, d) => Relational.joinCrossDims(s, d)),
    "date_arith_funcs"     -> ((s, d) => Relational.dateArithFuncs(s, d)),
    "agg_grouping_sets"    -> ((s, d) => Relational.aggGroupingSets(s, d)),
    "sort_limit_topk"      -> ((s, d) => Relational.sortLimitTopk(s, d)),
    "agg_distinct"         -> ((s, d) => Relational.aggDistinct(s, d)),
    "agg_rollup"           -> ((s, d) => Relational.aggRollup(s, d)),
    "agg_cube"             -> ((s, d) => Relational.aggCube(s, d)),
    "set_ops"              -> ((s, d) => Relational.setOps(s, d)),
    "string_funcs"         -> ((s, d) => Relational.stringFuncs(s, d)),
    "date_funcs"           -> ((s, d) => Relational.dateFuncs(s, d)),
    "math_case_funcs"      -> ((s, d) => Relational.mathCaseFuncs(s, d)),
    "json_extract"         -> ((s, d) => Relational.jsonExtract(s, d)),
    "agg_approx_distinct"  -> ((s, d) => Relational.aggApproxDistinct(s, d)),
    "agg_percentiles"      -> ((s, d) => Relational.aggPercentiles(s, d)),
    "agg_stats_moments"    -> ((s, d) => Relational.aggStatsMoments(s, d)),
    "agg_array_sorted"     -> ((s, d) => Relational.aggArraySorted(s, d)),
    "agg_pivot"            -> ((s, d) => Relational.aggPivot(s, d)),
    "agg_unpivot"          -> ((s, d) => Relational.aggUnpivot(s, d)),
    "agg_hll_sketch"       -> ((s, d) => Relational.aggHllSketch(s, d)),
    // Group C — LLM data-pipeline ops
    "dedup_exact"          -> ((s, d) => TextOps.dedupExact(s, d)),
    "text_pack_sequences"  -> ((s, d) => TextOps.packSequences(s, d)),
    "text_entropy"         -> ((s, d) => TextOps.tokenEntropy(s, d)),
    "embed_quantize"       -> ((s, d) => VectorOps.embedQuantize(s, d)),
    "dedup_exact_hash"     -> ((s, d) => TextOps.dedupExactHash(s, d)),
    "text_tokenize_counts" -> ((s, d) => TextOps.tokenizeCounts(s, d)),
    "text_lang_stats"      -> ((s, d) => TextOps.langStats(s, d)),
    "embed_norms"          -> ((s, d) => VectorOps.embedNorms(s, d)),
    "sim_topk_cosine"      -> ((s, d) => VectorOps.simTopkCosine(s, d)),
    "dedup_fuzzy_minhash"  -> ((s, d) => MinHash.fuzzyDedup(s, d)),
    "dedup_ngram_jaccard"  -> ((s, d) => TextOps.ngramJaccard(s, d)),
    "dedup_cluster_canonical" -> ((s, d) => TextOps.dedupClusters(s, d)),
    "dedup_simhash"        -> ((s, d) => SimHash.dedupSimhash(s, d)),
    "dedup_embed_cosine"   -> ((s, d) => EmbedLsh.dedupEmbedCosine(s, d)),
    "sim_ann_lsh"          -> ((s, d) => EmbedLsh.simAnnLsh(s, d)),
    "sim_ann_ivf"          -> ((s, d) => IvfAnn.simAnnIvf(s, d)),
    "vec_top_dims"         -> ((s, d) => VectorOps.vecTopDims(s, d)),
    "vec_label_centroids"  -> ((s, d) => VectorOps.vecLabelCentroids(s, d)),
    "text_clean_normalize" -> ((s, d) => TextOps.cleanNormalize(s, d)),
    "text_unigram_logprob" -> ((s, d) => TextOps.unigramLogprob(s, d)),
    "text_chunk_windows"   -> ((s, d) => TextOps.chunkWindows(s, d)),
    "sql_catalog_query"    -> ((s, d) => Relational.sqlCatalogQuery(s, d)),
    "text_lang_id"         -> ((s, d) => TextOps.langId(s, d)),
    "text_quality_score"   -> ((s, d) => TextOps.qualityScore(s, d)),
    "text_token_regex"     -> ((s, d) => TextOps.tokenRegexCounts(s, d)),
    "text_fingerprint"     -> ((s, d) => TextOps.fingerprint(s, d)),
    // multimodal plumbing (binary payload + metadata; decode is a stub)
    "mm_binary_meta"       -> ((s, d) => MultiModal.binaryMeta(s, d)),
    "mm_decode_stub"       -> ((s, d) => MultiModal.decodeFeatures(s, d)),
    "mm_resize_stub"       -> ((s, d) => MultiModal.resizeFeatures(s, d)),
    "mm_frame_sample"      -> ((s, d) => MultiModal.frameSample(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.sql
}
