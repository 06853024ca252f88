package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator has BOTH a `queries` entry (the Spark plan) and,
  * where SQL-expressible, an `oracleSql` entry (equivalent DuckDB SQL) so
  * the driver's hash-compare verifies it end-to-end.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Queries.q1PricingSummary _),
    "q3_shipping_priority" -> (Queries.q3ShippingPriority _),
    "q4_order_priority" -> (Queries.q4OrderPriority _),
    "q5_local_supplier" -> (Queries.q5LocalSupplier _),
    "q6_forecast_revenue" -> (Queries.q6ForecastRevenue _),
    "q7_window_topn" -> (Queries.q7WindowTopN _),
    "q8_rollup" -> (Queries.q8Rollup _),
    "q9_set_ops" -> (Queries.q9SetOps _),
    "q10_distinct_agg" -> (Queries.q10DistinctAgg _),
    "q11_anti_join" -> (Queries.q11AntiJoin _),
    "q13_cust_dist" -> (Queries.q13CustDist _),
    "q14_promo_share" -> (Queries.q14PromoShare _),
    "q15_top_supplier" -> (Queries.q15TopSupplier _),
    "q17_small_qty" -> (Queries.q17SmallQty _),
    "q18_large_orders" -> (Queries.q18LargeOrders _),
    "q10_returned_items" -> (Queries.q10ReturnedItems _),
    "q19_disjunctive" -> (Queries.q19DisjunctivePredicates _),
    "q22_inactive_rich" -> (Queries.q22InactiveRich _),
    "q_nation_top_balance" -> (Queries.qNationTopBalance _),
    "q_window_running" -> (Queries.qWindowRunning _),
    "q_window_frames" -> (Queries.qWindowFrames _),
    "q_cube_counts" -> (Queries.qCubeCounts _),
    "q_events_hourly" -> (Queries.qEventsHourly _),
    "q_events_json" -> (Queries.qEventsJson _),
    "q_events_sessions" -> (Queries.qEventsSessions _),
    "q_asof_join" -> (Queries.qAsofJoin _),
    "q_interval_join" -> (Queries.qIntervalJoin _),
    "q_pivot" -> (Queries.qPivot _),
    "q_percentiles" -> (Queries.qPercentiles _),
    // transform-layer wiring (W1/W2/A4/J1/W5-W6/F1)
    "t_profile_counts" -> (TransformQueries.tProfileCounts _),
    "t_summary_stats" -> (TransformQueries.tSummaryStats _),
    "t_derive_flags" -> (TransformQueries.tDeriveFlags _),
    "t_topk_values" -> (TransformQueries.tTopkValues _),
    "t_ids_contiguous" -> (TransformQueries.tIdsContiguous _),
    "t_dedupe_append" -> (TransformQueries.tDedupeAppend _),
    "t_stringify_export" -> (TransformQueries.tStringifyExport _),
    "t_parse_flag" -> (TransformQueries.tParseFlag _),
    "t_sql_passthrough" -> (TransformQueries.tSqlPassthrough _),
    "t_salted_agg" -> (TransformQueries.tSaltedAgg _),
    // I/O round-trips (S1/S2/K3 + S7 DSv2 write/scan)
    "t_csv_roundtrip" -> (TransformQueries.tCsvRoundtrip _),
    "t_keyed_pushdown" -> (TransformQueries.tKeyedPushdown _),
    // LLM-pipeline north-star ops (SURVEY §2.10)
    "x_dedup_exact" -> (ExtQueries.xDedupExact _),
    "x_dedup_jaccard" -> (ExtQueries.xDedupJaccard _),
    "x_dedup_minhash" -> (ExtQueries.xDedupMinhash _),
    "x_dedup_embed" -> (ExtQueries.xDedupEmbed _),
    "x_dedup_simhash" -> (ExtQueries.xDedupSimhash _),
    "x_sim_topk" -> (ExtQueries.xSimTopk _),
    "x_sim_ann" -> (ExtQueries.xSimAnn _),
    "x_sim_ivf" -> (ExtQueries.xSimIvf _),
    "x_dedup_corpus" -> (ExtQueries.xDedupCorpus _),
    "x_text_stats" -> (ExtQueries.xTextStats _),
    "x_text_langid" -> (ExtQueries.xTextLangid _),
    "x_text_fingerprint" -> (ExtQueries.xTextFingerprint _),
    "x_text_clean" -> (ExtQueries.xTextClean _),
    "x_text_filter" -> (ExtQueries.xTextFilter _),
    "x_text_pack" -> (ExtQueries.xTextPack _),
    "x_text_sentiment" -> (ExtQueries.xTextSentiment _),
    "x_media_features" -> (ExtQueries.xMediaFeatures _),
    "x_frame_sample" -> (ExtQueries.xFrameSample _),
    "x_fuzzy_match" -> (ExtQueries.xFuzzyMatch _),
    "x_text_redact" -> (ExtQueries.xTextRedact _),
    "x_sample_split" -> (ExtQueries.xSampleSplit _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Queries.q1Sql,
    "q3_shipping_priority" -> Queries.q3Sql,
    "q4_order_priority" -> Queries.q4Sql,
    "q5_local_supplier" -> Queries.q5Sql,
    "q6_forecast_revenue" -> Queries.q6Sql,
    "q7_window_topn" -> Queries.q7Sql,
    "q8_rollup" -> Queries.q8Sql,
    "q9_set_ops" -> Queries.q9Sql,
    "q10_distinct_agg" -> Queries.q10Sql,
    "q11_anti_join" -> Queries.q11Sql,
    "q13_cust_dist" -> Queries.q13Sql,
    "q14_promo_share" -> Queries.q14Sql,
    "q15_top_supplier" -> Queries.q15Sql,
    "q17_small_qty" -> Queries.q17Sql,
    "q18_large_orders" -> Queries.q18Sql,
    "q10_returned_items" -> Queries.q10ReturnedSql,
    "q19_disjunctive" -> Queries.q19Sql,
    "q22_inactive_rich" -> Queries.q22Sql,
    "q_nation_top_balance" -> Queries.qNationTopBalanceSql,
    "q_window_running" -> Queries.qWindowRunningSql,
    "q_window_frames" -> Queries.qWindowFramesSql,
    "q_cube_counts" -> Queries.qCubeCountsSql,
    "q_events_hourly" -> Queries.qEventsHourlySql,
    "q_events_json" -> Queries.qEventsJsonSql,
    "q_events_sessions" -> Queries.qEventsSessionsSql,
    "q_asof_join" -> Queries.qAsofJoinSql,
    "q_interval_join" -> Queries.qIntervalJoinSql,
    "q_pivot" -> Queries.qPivotSql,
    "q_percentiles" -> Queries.qPercentilesSql,
    "t_profile_counts" -> TransformQueries.tProfileCountsSql,
    "t_summary_stats" -> TransformQueries.tSummaryStatsSql,
    "t_derive_flags" -> TransformQueries.tDeriveFlagsSql,
    "t_topk_values" -> TransformQueries.tTopkValuesSql,
    "t_ids_contiguous" -> TransformQueries.tIdsContiguousSql,
    "t_dedupe_append" -> TransformQueries.tDedupeAppendSql,
    "t_stringify_export" -> TransformQueries.tStringifyExportSql,
    "t_parse_flag" -> TransformQueries.tParseFlagSql,
    "t_sql_passthrough" -> TransformQueries.passthroughSql,
    "t_salted_agg" -> TransformQueries.tSaltedAggSql,
    "t_csv_roundtrip" -> TransformQueries.tCsvRoundtripSql,
    "t_keyed_pushdown" -> TransformQueries.tKeyedPushdownSql,
    "x_dedup_exact" -> ExtQueries.xDedupExactSql,
    "x_dedup_jaccard" -> ExtQueries.xDedupJaccardSql,
    "x_dedup_minhash" -> ExtQueries.xDedupMinhashSql,
    "x_dedup_embed" -> ExtQueries.xDedupEmbedSql,
    "x_dedup_corpus" -> ExtQueries.xDedupCorpusSql,
    "x_sim_topk" -> ExtQueries.xSimTopkSql,
    "x_sim_ann" -> ExtQueries.xSimAnnSql,
    "x_text_stats" -> ExtQueries.xTextStatsSql,
    "x_text_langid" -> ExtQueries.xTextLangidSql,
    "x_text_fingerprint" -> ExtQueries.xTextFingerprintSql,
    "x_text_clean" -> ExtQueries.xTextCleanSql,
    "x_text_filter" -> ExtQueries.xTextFilterSql,
    "x_text_pack" -> ExtQueries.xTextPackSql,
    "x_text_sentiment" -> ExtQueries.xTextSentimentSql,
    "x_media_features" -> ExtQueries.xMediaFeaturesSql,
    "x_frame_sample" -> ExtQueries.xFrameSampleSql,
    "x_fuzzy_match" -> ExtQueries.xFuzzyMatchSql,
    "x_text_redact" -> ExtQueries.xTextRedactSql,
    "x_sample_split" -> ExtQueries.xSampleSplitSql,
    // x_dedup_simhash (xxhash64-seeded Hamming distances) and x_sim_ivf
    // (k-means cells) have no bit-exact DuckDB twin → rows-only checks.
    // x_dedup_minhash IS oracled: at threshold 0.8 the fixed-hash LSH
    // result provably equals the exact all-pairs answer (see its SQL).
  )
}
