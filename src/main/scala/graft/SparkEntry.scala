package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Bpe, Curate, Dedup, Medallion, Multimodal, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7
  * (build plan). Each `queries` entry has a DuckDB `oracleSql` twin
  * following the cross-engine determinism rules in SURVEY.md §3.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Medallion.goldSalesReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * INSERTION-ORDERED (r16): the bench and verify drivers iterate
    * this map, and a hash-ordered `Map` reshuffles execution order
    * whenever an entry is added — which moves shared-artifact warmup
    * (e.g. [[graft.sources.Memo]] bases) between queries and makes
    * round-over-round timings incomparable. A ListMap pins the order
    * to this declaration. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
    // §2.A — reference surface (medallion)
    "bronze_orders_nested" -> (Medallion.bronzeVerification _),
    "silver_enrich" -> (Medallion.silverVerification _),
    "gold_sales_report" -> (Medallion.goldSalesReport _),
    "sql_catalog_query" -> (Medallion.sqlCatalogQuery _),
    "sql_lakehouse_ddl" -> (Medallion.sqlLakehouseDdl _),
    "mview_incremental" -> (Medallion.mviewIncremental _),
    "mview_join" -> (Medallion.mviewJoin _),
    "mview_star" -> (Medallion.mviewStar _),
    "mview_dim_delta" -> (Medallion.mviewDimDelta _),
    "mview_left_delta" -> (Medallion.mviewLeftDelta _),
    "sql_mview" -> (Medallion.sqlMview _),
    "sql_wap" -> (Medallion.sqlWap _),
    "sql_time_travel" -> (Medallion.sqlTimeTravel _),
    "sql_hidden_partition" -> (Medallion.sqlHiddenPartition _),
    "sql_schema_evolution" -> (Medallion.sqlSchemaEvolution _),
    "sql_branch_workflow" -> (Medallion.sqlBranchWorkflow _),
    "sql_maintenance" -> (Medallion.sqlMaintenance _),
    "sql_stats_agg" -> (Medallion.sqlStatsAgg _),
    "sql_group_agg" -> (Medallion.sqlGroupAgg _),
    "q_runtime_filter" -> (Medallion.qRuntimeFilter _),
    "q_cdc_read" -> (Medallion.qCdcRead _),
    "q_bucket_join" -> (Medallion.qBucketJoin _),
    "q_spj_join" -> (Medallion.qSpjJoin _),
    "q_spj_agg" -> (Medallion.qSpjAgg _),
    "q_spj_group_agg" -> (Medallion.qSpjGroupAgg _),
    "q_spj_sorted_join" -> (Medallion.qSpjSortedJoin _),
    "q_spj_two_level" -> (Medallion.qSpjTwoLevel _),
    "q_spj_daily_join" -> (Medallion.qSpjDailyJoin _),
    "q_spj_runtime_filter" -> (Medallion.qSpjRuntimeFilter _),
    "q_spj_limit" -> (Medallion.qSpjLimit _),
    "q_spj_topn" -> (Medallion.qSpjTopn _),
    "q_spj_ddl" -> (Medallion.qSpjDdl _),
    "q_spj_update" -> (Medallion.qSpjUpdate _),
    "q_spj_merge" -> (Medallion.qSpjMerge _),
    "q_spj_mor" -> (Medallion.qSpjMor _),
    "q_spj_update_mor" -> (Medallion.qSpjUpdateMor _),
    "q_spj_alter" -> (Medallion.qSpjAlter _),
    "sql_nested_evolution" -> (Medallion.qSqlNestedEvolution _),
    "stream_spj_cdc" -> (Medallion.qStreamSpjCdc _),
    "stream_range_join" -> (graft.streaming.EventStream.streamRangeJoin _),
    "stream_range_join_outer" -> (graft.streaming.EventStream.streamRangeJoinOuter _),
    // §2.B — relational core
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier" -> (Relational.q5LocalSupplier _),
    "q_filter_pushdown" -> (Relational.qFilterPushdown _),
    "q_topk_orders" -> (Relational.qTopkOrders _),
    "q_distinct_agg" -> (Relational.qDistinctAgg _),
    "q_window_rank" -> (Relational.qWindowRank _),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_rollup" -> (Relational.qRollup _),
    "q_pivot_status" -> (Relational.qPivotStatus _),
    "q_scalar_subquery" -> (Relational.qScalarSubquery _),
    "q_asof_join" -> (Relational.qAsofJoin _),
    "q_events_hourly" -> (Relational.qEventsHourly _),
    "stream_events_hourly" ->
      ((s, d) => graft.streaming.EventStream.streamEventsHourlyOracle(s, d)),
    "stream_spj_tail" ->
      ((s, d) => graft.streaming.EventStream.streamSpjTail(s, d)),
    "stream_cdc_replicate" ->
      ((s, d) => graft.streaming.EventStream.streamCdcReplicate(s, d)),
    "stream_sessionize" ->
      ((s, d) => graft.streaming.EventStream.streamSessionize(s, d)),
    "q_events_retention" -> (Relational.qEventsRetention _),
    "q_events_tophh" -> (Relational.qEventsTophh _),
    "q_grouping_sets" -> (Relational.qGroupingSets _),
    "q_events_sessionize" -> (Relational.qEventsSessionize _),
    "q_events_json" -> (Relational.qEventsJson _),
    "q_events_anomaly" -> (Relational.qEventsAnomaly _),
    "q_cube" -> (Relational.qCube _),
    "q_string_agg" -> (Relational.qStringAgg _),
    "q_set_ops" -> (Relational.qSetOps _),
    "q_range_join" -> (Relational.qRangeJoin _),
    "q_median_price" -> (Relational.qMedianPrice _),
    "q7_volume_shipping" -> (Relational.q7VolumeShipping _),
    "q10_returned_items" -> (Relational.q10ReturnedItems _),
    "q18_large_orders" -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q_events_funnel" -> (Relational.qEventsFunnel _),
    "q14_promo_effect" -> (Relational.q14PromoEffect _),
    "q19_discounted_revenue" -> (Relational.q19DiscountedRevenue _),
    "q13_order_distribution" -> (Relational.q13OrderDistribution _),
    "q17_small_quantity" -> (Relational.q17SmallQuantity _),
    "q_running_total" -> (Relational.qRunningTotal _),
    "q2_min_cost_supplier" -> (Relational.q2MinCostSupplier _),
    "q4_order_priority" -> (Relational.q4OrderPriority _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q8_market_share" -> (Relational.q8MarketShare _),
    "q9_product_profit" -> (Relational.q9ProductProfit _),
    "q11_important_stock" -> (Relational.q11ImportantStock _),
    "q12_shipping_classes" -> (Relational.q12ShippingClasses _),
    "q15_top_supplier" -> (Relational.q15TopSupplier _),
    "q16_parts_suppliers" -> (Relational.q16PartsSuppliers _),
    "q20_part_promotion" -> (Relational.q20PartPromotion _),
    "q21_waiting_suppliers" -> (Relational.q21WaitingSuppliers _),
    "q22_sales_opportunity" -> (Relational.q22SalesOpportunity _),
    // §2.C — deduplication
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.dedupNgramJaccard(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.dedupContainment(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.dedupMinhashLsh(s, d)),
    // persistent near-dup index: create on 2/3, append 1/3, one
    // O(delta) refresh reports the new batch's pairs
    "dedup_index_incremental" -> ((s, d) => Dedup.dedupIndexIncremental(s, d)),
    // cluster-keep-one decisions for the whole corpus, derived from
    // the index's accumulated pairs ledger alone
    "dedup_index_admission" -> ((s, d) => Dedup.dedupIndexAdmission(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.dedupSimhash(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.dedupEmbedding(s, d)),
    // near-dup pairs -> keep-one clusters (connected components)
    "dedup_components" -> ((s, d) => Dedup.dedupComponents(s, d)),
    // duplicate-span removal (C4/CCNet sub-document dedup)
    "dedup_spans" -> ((s, d) => Dedup.dedupSpans(s, d)),
    // §2.D — similarity search
    "ann_cosine_topk" -> ((s, d) => Similarity.annCosineTopk(s, d)),
    "ann_lsh_bucketed" -> ((s, d) => Similarity.annLshTopk(s, d)),
    "ann_nsw_topk" -> ((s, d) => Similarity.annNswTopk(s, d)),
    "hybrid_search_rrf" -> ((s, d) => Similarity.hybridSearchRrf(s, d)),
    "ann_ivf_topk" -> ((s, d) => Similarity.annIvfTopk(s, d)),
    "ann_lsh_multiprobe" -> ((s, d) => Similarity.annLshMultiprobe(s, d)),
    // training isn't SQL-restatable, but the trained centroids are
    // captured into a literal-VALUES oracle (see oracleSql ++ below)
    "ann_ivf_trained" -> ((s, d) => Similarity.annIvfTrained(s, d)),
    "ann_index_incremental" -> ((s, d) => Similarity.annIndexIncremental(s, d)),
    "ann_index_rebalanced" -> ((s, d) => Similarity.annIndexRebalanced(s, d)),
    "ann_filtered_topk" -> ((s, d) => Similarity.annFilteredTopk(s, d)),
    "ann_pq_topk" -> ((s, d) => Similarity.annPqTopk(s, d)),
    "ann_ivfpq_topk" -> ((s, d) => Similarity.annIvfPqTopk(s, d)),
    "ann_ivfpq_rerank" -> ((s, d) => Similarity.annIvfPqRerank(s, d)),
    "ann_bq_rerank" -> ((s, d) => Similarity.annBqRerank(s, d)),
    // §2.E — text analysis
    "text_langid" -> (TextAnalysis.textLangid _),
    "text_quality" -> (TextAnalysis.textQuality _),
    "text_tokens" -> (TextAnalysis.textTokens _),
    "text_top_ngrams" -> ((s, d) => TextAnalysis.textTopNgrams(s, d)),
    "text_fingerprint" -> (TextAnalysis.textFingerprint _),
    "text_rep_ngrams" -> (TextAnalysis.textRepNgrams _),
    "text_pii" -> (TextAnalysis.textPii _),
    "text_chunk" -> ((s, d) => TextAnalysis.textChunk(s, d)),
    "text_collocations" -> ((s, d) => TextAnalysis.textCollocations(s, d)),
    "text_tfidf_keywords" -> ((s, d) => TextAnalysis.textTfidfKeywords(s, d)),
    "text_bpe_train" -> ((s, d) => Bpe.trainDf(s, d)),
    "text_bpe_encode" -> ((s, d) => Bpe.encodeStats(s, d)),
    "sketch_distinct_ngrams" -> ((s, d) => operators.Sketches.sketchDistinctNgrams(s, d)),
    "sketch_source_overlap" -> ((s, d) => operators.Sketches.sketchSourceOverlap(s, d)),
    "sketch_algebra" -> ((s, d) => operators.Sketches.sketchAlgebra(s, d)),
    "sketch_quantiles" -> ((s, d) => operators.Sketches.sketchQuantiles(s, d)),
    // corpus-unigram LM quality proxy (perplexity-bucketing signal)
    "text_unigram_logprob" -> (TextAnalysis.textUnigramLogprob _),
    // §2.F — multimodal
    "multimodal_features" -> (Multimodal.multimodalFeatures _),
    "multimodal_framehash" -> ((s, d) => Multimodal.multimodalFramehash(s, d)),
    // flagship composition: quality gate → language gate → dedup drop
    "pipeline_curate" -> (Curate.pipelineCurate _),
    // cluster-accurate variant: keep-one-per-component drop
    "pipeline_curate_cc" -> (Curate.pipelineCurateCc _),
    // training-mix rebalance: deterministic hash-stratified sampling
    "pipeline_sample" -> (Curate.pipelineSample _),
    "pipeline_shuffle" -> (Curate.pipelineShuffle _),
    "pipeline_epochs" -> ((s, d) => Curate.pipelineEpochs(s, d)),
    "pipeline_split" -> (Curate.pipelineSplit _),
    // temperature-based mixture rebalance (share^(1/T) language mix)
    "pipeline_mix_temperature" -> ((s, d) => Curate.pipelineMixTemperature(s, d)),
    // concat-then-chunk sequence packing (block-local running sums)
    "pipeline_pack" -> ((s, d) => Curate.pipelinePack(s, d)),
    // full curate -> sample -> pack training-mix flow, one plan
    "pipeline_train_mix" -> ((s, d) => Curate.pipelineTrainMix(s, d)),
    // benchmark-decontamination: exact shingle overlap vs holdout
    "pipeline_decontaminate" -> ((s, d) => Dedup.pipelineDecontaminate(s, d)),
    // token-budgeted selection: best-quality docs until the budget
    "pipeline_token_budget" -> ((s, d) => Curate.pipelineTokenBudget(s, d)),
    "pipeline_domain_cap" -> ((s, d) => Curate.pipelineDomainCap(s, d)),
    // perplexity-band middle-keep: drop P10/P90 tails of the LM score
    "pipeline_perplexity_filter" -> ((s, d) => Curate.pipelinePerplexityFilter(s, d)),
    // embedding-space decontamination vs the broadcast holdout
    "pipeline_decontaminate_semantic" -> ((s, d) => Dedup.pipelineDecontaminateSemantic(s, d)),
    // r17 (appended last to keep bench order comparable): above-gate
    // equality tombstones served lazily; group-vanish incremental mview
    "q_spj_lazy_eq" -> (Medallion.qSpjLazyEq _),
    "mview_vanish" -> (Medallion.mviewVanish _),
    "mview_fact_mor" -> (Medallion.mviewFactMor _),
    // grouped aggregate pushdown beyond identity shapes: per-file-
    // constant group columns answer from the ledgers on any layout
    "q_spj_group_stats" -> (Medallion.qSpjGroupStats _),
    // claimed-exact identity filters: the conjunct vanishes from the
    // plan and the filtered rollup stays a metadata readout
    "q_spj_filter_claim" -> (Medallion.qSpjFilterClaim _),
    // claimed days(date) window filters: BETWEEN vanishes, the
    // windowed rollup reads only the window's day dirs' ledgers
    "q_spj_time_claim" -> (Medallion.qSpjTimeClaim _),
  )

  /** DuckDB-runnable ANSI SQL twins (same table names, same aliases,
    * same deterministic arithmetic — SURVEY.md §3). The trained-IVF
    * oracle is appended dynamically: Verify dumps this map AFTER the
    * queries run, so the k-means centroids the query actually used are
    * restated as a literal VALUES table. */
  def oracleSql: Map[String, String] =
    staticOracleSql ++ Similarity.trainedOracleSql.map("ann_ivf_trained" -> _) ++
      Similarity.pqOracleSql.map("ann_pq_topk" -> _) ++
      Similarity.ivfpqOracleSql.map("ann_ivfpq_topk" -> _) ++
      Similarity.ivfpqRerankOracleSql.map("ann_ivfpq_rerank" -> _) ++
      Similarity.annIndexOracleSql.map("ann_index_incremental" -> _) ++
      Similarity.annIndexRebalancedOracleSql.map("ann_index_rebalanced" -> _)

  private def staticOracleSql: Map[String, String] = Map(
    "bronze_orders_nested" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  count(l_orderkey) AS item_count,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS items_total
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_custkey, o_orderstatus
        |ORDER BY o_orderkey""".stripMargin,
    "silver_enrich" ->
      """SELECT c_custkey, n_name AS city, r_name AS state,
        |  CAST(c_custkey AS VARCHAR) AS zip, 'INDIA' AS country
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "gold_sales_report" ->
      """SELECT n_name AS city, 'INDIA' AS country,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |  count(o_orderkey) AS order_count
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY total_revenue DESC, city""".stripMargin,
    "sql_catalog_query" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    // create(F) → INSERT(O) → MERGE(custkey%97, doubled) → UPDATE(+1
    // incremental materialized view: two delta-merge refreshes must
    // land bit-exactly on the full GROUP BY over every order
    "mview_incremental" ->
      """SELECT o_orderstatus,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS min_price,
        |  round(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // join-shaped incremental view: delta merges + one dim-change
    // recompute must land bit-exactly on the grouped join over all
    // of orders x customer
    "mview_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // multi-hop snowflake view: two fact-delta merges + one chain
    // recompute (hop-2 dim re-label, restated as CASE) must equal the
    // from-scratch two-join rollup
    "mview_star" ->
      """WITH nat AS (SELECT n_nationkey,
        |  CASE WHEN n_nationkey < 5 THEN 'ZONE_A' ELSE n_name END AS n_name
        |  FROM nation)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nat ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // write-audit-publish: the staged batch minus audited-out rows —
    // the hash proves corrupt rows never reached main and the rest did
    "sql_wap" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus <> 'P'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the same view lifecycle through parsed SQL (CREATE MATERIALIZED
    // VIEW / INSERT / CALL refresh_mview): same full-GROUP-BY oracle
    "sql_mview" ->
      """SELECT o_orderstatus,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS min_price,
        |  round(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // on orderkey%11) → DELETE(orderkey%7) — all parsed SQL DML
    "sql_lakehouse_ddl" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderstatus IN ('F','O')),
        |src AS (SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_custkey % 97 = 0),
        |merged AS (SELECT * FROM src
        |  UNION ALL
        |  SELECT b.* FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = b.o_orderkey)),
        |cond_src AS (SELECT o_orderkey, o_orderstatus, o_totalprice + 10 AS o_totalprice
        |  FROM orders WHERE o_custkey % 89 = 0),
        |cond AS (
        |  SELECT m.o_orderkey, m.o_orderstatus, m.o_totalprice FROM merged m
        |  WHERE NOT EXISTS (SELECT 1 FROM cond_src c WHERE c.o_orderkey = m.o_orderkey)
        |  UNION ALL
        |  SELECT c.o_orderkey, c.o_orderstatus, c.o_totalprice
        |  FROM merged m JOIN cond_src c ON m.o_orderkey = c.o_orderkey
        |  WHERE NOT (m.o_totalprice > 150000)
        |  UNION ALL
        |  SELECT c.o_orderkey, c.o_orderstatus, c.o_totalprice FROM cond_src c
        |  WHERE NOT EXISTS (SELECT 1 FROM merged m WHERE m.o_orderkey = c.o_orderkey)
        |    AND c.o_totalprice < 100000),
        |updated AS (SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1 ELSE o_totalprice END
        |    AS o_totalprice FROM cond),
        |deleted AS (SELECT * FROM updated WHERE NOT (o_orderkey % 7 = 0))
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM deleted
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "sql_time_travel" ->
      """SELECT 'v1' AS at, o_orderstatus, count(*) AS n
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderstatus
        |UNION ALL
        |SELECT 'now' AS at, o_orderstatus, count(*) AS n
        |FROM orders WHERE o_orderstatus IN ('F','O')
        |GROUP BY o_orderstatus
        |ORDER BY at, o_orderstatus""".stripMargin,
    "sql_schema_evolution" ->
      """SELECT tier, count(*) AS n,
        |  CAST(coalesce(sum(CAST(balance AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_balance,
        |  CAST(coalesce(sum(CAST(bonus AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_bonus,
        |  CAST(sum(visits) AS BIGINT) AS total_visits
        |FROM (
        |  SELECT 'legacy' AS tier, c_acctbal AS balance, 0.0 AS bonus, 1 AS visits
        |  FROM customer WHERE c_custkey <= 500
        |  UNION ALL
        |  SELECT 'fresh' AS tier, c_acctbal AS balance, c_acctbal * 2 AS bonus, 2 AS visits
        |  FROM customer WHERE c_custkey <= 200
        |  UNION ALL
        |  SELECT 'partial' AS tier, NULL AS balance, NULL AS bonus, 4000000000 AS visits
        |  FROM customer WHERE c_custkey <= 100
        |) t
        |GROUP BY tier
        |ORDER BY tier""".stripMargin,
    "sql_branch_workflow" ->
      """WITH merged AS (
        |  SELECT CASE WHEN o_totalprice > 200000
        |              THEN o_totalprice - 50000 ELSE o_totalprice END AS p
        |  FROM orders WHERE o_orderstatus IN ('F','O'))
        |SELECT 'main_before' AS at, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 'branch' AS at, count(*) AS n,
        |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM merged
        |UNION ALL
        |SELECT 'main_after' AS at, count(*) AS n,
        |  CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM merged
        |ORDER BY at""".stripMargin,
    // bucketed co-located join: the oracle recomputes the rollup by a
    // plain join and pins colocated = 1.0 — the executed bucketed
    // join plan must contain no Exchange
    "q_bucket_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS colocated
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // storage-partitioned join: same grouped-join semantics, and the
    // pinned colocated=1.0 asserts the DSv2 KeyGroupedPartitioning
    // path planned the join with no Exchange
    "q_spj_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS colocated
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // dim-side incremental view maintenance: the oracle recomputes
    // the enrichment join with the dim update applied via CASE;
    // incremental = 1.0 pins that the subtractive dim-delta leg
    // committed (the dim-keyed negative batch id), not a recompute
    "mview_dim_delta" ->
      """WITH dim AS (SELECT c_custkey,
        |  CASE WHEN c_custkey <= 100 AND c_custkey % 2 = 0
        |    THEN 'PROMO' ELSE c_mktsegment END
        |    AS c_mktsegment FROM customer)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(1.0 AS DOUBLE) AS incremental
        |FROM orders JOIN dim ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // left-outer join view, dim-delta maintained: unmatched facts
    // keep an UNMATCHED bucket; incremental = 1.0 pins the
    // subtractive path (with its null-extension legs) committed
    "mview_left_delta" ->
      """WITH dim AS (SELECT c_custkey,
        |  CASE WHEN c_custkey <= 100 AND c_custkey % 2 = 0
        |    THEN 'PROMO' ELSE c_mktsegment END
        |    AS c_mktsegment FROM customer WHERE c_custkey % 7 <> 0)
        |SELECT coalesce(c_mktsegment, 'UNMATCHED') AS c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(1.0 AS DOUBLE) AS incremental
        |FROM orders LEFT JOIN dim ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // DSv2 aggregate pushdown: the oracle recomputes the global
    // readout by scanning; meta_only = 1.0 pins that the engine
    // answered it as ONE driver-local row (no file scan in the plan)
    "q_spj_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(min(o_orderkey) AS BIGINT) AS k_lo,
        |  CAST(max(o_orderkey) AS BIGINT) AS k_hi,
        |  min(o_orderstatus) AS s_lo, max(o_orderstatus) AS s_hi,
        |  CAST(sum(o_orderkey) AS BIGINT) AS s_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s_price,
        |  CAST(1.0 AS DOUBLE) AS meta_only
        |FROM orders""".stripMargin,
    // grouped DSv2 pushdown over an identity layout: the oracle
    // recomputes the rollup by scanning; meta_only = 1.0 pins that the
    // engine's answer came from ONE LocalTableScanExec (per-partition
    // ledger folds), no file scan — the gold GROUP BY priced as metadata
    "q_spj_group_agg" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(min(o_orderkey) AS BIGINT) AS k_lo,
        |  CAST(max(o_orderkey) AS BIGINT) AS k_hi,
        |  CAST(sum(o_orderkey) AS BIGINT) AS s_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s_price,
        |  CAST(1.0 AS DOUBLE) AS meta_only
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // identity × bucket layouts: the oracle recomputes the rollup by
    // scanning; colocated = 1.0 pins the Exchange-free two-dimension
    // join, meta_only = 1.0 pins the ledger-answered grouped readout
    "q_spj_two_level" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(min(o_orderkey) AS BIGINT) AS k_lo,
        |  CAST(max(o_orderkey) AS BIGINT) AS k_hi,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s_price,
        |  CAST(1.0 AS DOUBLE) AS meta_only, CAST(1.0 AS DOUBLE) AS colocated
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // calendar × bucket layouts: the oracle recomputes the windowed
    // rollup by scanning; colocated = 1.0 pins the Exchange-free
    // join-on-the-id-alone (subset of the partition keys), pruned =
    // 1.0 pins that the date window dropped the other years' files
    "q_spj_daily_join" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_1995,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_1995,
        |  CAST(1.0 AS DOUBLE) AS pruned, CAST(1.0 AS DOUBLE) AS colocated
        |FROM orders
        |WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'""".stripMargin,
    // SPJ + reported ordering: the oracle recomputes the join by
    // scanning; presorted = 1.0 pins that the executed merge join had
    // ZERO Exchange and ZERO Sort nodes (both proven from write-time
    // sort markers + disjoint per-file key ranges)
    "q_spj_sorted_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS presorted
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // DSv2 runtime filtering: the oracle recomputes the dim-filtered
    // join by scanning; pruned = 1.0 pins that a DPP filter reached
    // the SPJ scan and shrank its planned file list
    "q_spj_runtime_filter" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS pruned
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_custkey < 3
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // DSv2 limit pushdown: the exact row count survives the file cap
    // (Spark keeps the limit on top); limited = 1.0 pins that the
    // scan planned fewer files than the layout holds
    "q_spj_limit" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt, CAST(1.0 AS DOUBLE) AS limited
        |FROM (SELECT * FROM orders LIMIT 500)""".stripMargin,
    // DSv2 TopN pushdown: deterministic rows (unique sort key), and
    // pruned = 1.0 pins that sort-bound file capping engaged
    "q_spj_topn" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  CAST(1.0 AS DOUBLE) AS pruned
        |FROM orders ORDER BY o_orderkey DESC LIMIT 50""".stripMargin,
    // DSv2 DDL lifecycle: CREATE TABLE / INSERT INTO / DELETE / CTAS,
    // all plain SQL on the catalog; colocated = 1.0 pins that the
    // DDL-declared bucket layouts SPJ-plan the join with no Exchange
    "q_spj_ddl" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS colocated
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'P'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // Spark-native SQL UPDATE (group-based CoW row-level op): the
    // oracle restates the final table state via CASE; rewrote_leaves=1
    // pins that static bucket pruning bounded the rewrite to the ONE
    // partition leaf holding the key — every other leaf carried by
    // ledger reference
    "q_spj_update" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN o_custkey = (SELECT min(o_custkey) FROM orders)
        |    THEN CAST(o_totalprice AS DECIMAL(12,2)) * 2
        |    ELSE CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total,
        |  CAST(1 AS BIGINT) AS rewrote_leaves
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Spark-native SQL MERGE INTO (group-based CoW): the oracle
    // restates the upserted table as a FULL OUTER join of the even-key
    // target seed with the per-customer order counts, then rolls it up
    "q_spj_merge" ->
      """WITH src AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_ord
        |  FROM orders GROUP BY 1),
        |tgt AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |  CAST(0 AS BIGINT) AS n_ord FROM customer WHERE c_custkey % 2 = 0),
        |final AS (SELECT coalesce(t.k, s.k) AS k,
        |  CASE WHEN t.k IS NULL THEN 'NEW' ELSE t.seg END AS seg,
        |  coalesce(s.n_ord, t.n_ord) AS n_ord
        |  FROM tgt t FULL OUTER JOIN src s ON t.k = s.k)
        |SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_ord) AS BIGINT) AS orders
        |FROM final GROUP BY seg ORDER BY seg""".stripMargin,
    // merge-on-read maintenance SERVED through the DSv2 catalog: the
    // oracle restates the tombstoned state as filters over the raw
    // rows; colocated = 1.0 pins the join stayed Exchange-free over
    // the tombstoned table, rewrote_leaves = 0 pins that both MoR
    // deletes rewrote zero data entries
    "q_spj_mor" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS colocated, CAST(0 AS BIGINT) AS rewrote_leaves
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'P' AND o_orderkey % 97 <> 0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // merge-on-read UPDATE (delta row-level op): the oracle restates
    // the final state via CASE; rewrote_leaves = 0 pins that every
    // original file carried by reference (position deletes + one
    // delta dir, never a leaf rewrite), tombstoned = 1 pins the
    // snapshot carries the positional tombstone
    "q_spj_update_mor" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(o_totalprice AS DECIMAL(12,2)) * 2
        |    ELSE CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total,
        |  CAST(0 AS BIGINT) AS rewrote_leaves, CAST(1 AS BIGINT) AS tombstoned
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // DSv2 ALTER TABLE lifecycle: pre-evolution rows (even keys) read
    // the added column as NULL ('PRE' group) and the renamed column's
    // values; post-evolution rows carry their status
    "q_spj_alter" ->
      """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus ELSE 'PRE' END AS status_g,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS grouped_commit,
        |  CAST(1.0 AS DOUBLE) AS renamed
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // stream-stream interval join: the INNER restatement of
    // q_range_join (click-less purchases never emit a pair)
    "stream_range_join" ->
      """SELECT p.event_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks_10m,
        |  CAST(1.0 AS DOUBLE) AS exactly_once
        |FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id % 7 < 2) p
        |JOIN (SELECT * FROM events WHERE event_type = 'click' AND user_id % 7 < 2) c
        |  ON p.user_id = c.user_id AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    // the OUTER variant: DuckDB's LEFT restatement — click-less
    // purchases appear with n_clicks_10m = 0 (the watermark-flush
    // null extension, counted as zero by count(click_id))
    "stream_range_join_outer" ->
      """SELECT p.event_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks_10m,
        |  CAST(1.0 AS DOUBLE) AS exactly_once
        |FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id % 7 = 2) p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click' AND user_id % 7 = 2) c
        |  ON p.user_id = c.user_id AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    // CDC on the DSv2 catalog stream: the oracle restates the net
    // final state the replica must reach — every order except the
    // deleted O-status okey%9=2 rows, price tripled where okey%13=4
    "stream_spj_cdc" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(price) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS replica_exact,
        |  CAST(1.0 AS DOUBLE) AS exactly_once
        |FROM (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 4
        |      THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 3 AS DECIMAL(12,2))
        |      ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS price
        |  FROM orders
        |  WHERE NOT (o_orderstatus = 'O' AND o_orderkey % 9 = 2)
        |)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // NESTED schema evolution: pre-evolution rows (even keys) read the
    // added struct field as NULL, post-evolution rows carry a grade;
    // the renamed field resolves from both physical shapes and the
    // dropped one is gone; the MoR delete (every 97th key) applies
    // across struct shapes; both pins must hold
    "sql_nested_evolution" ->
      """SELECT o_orderstatus AS status_g,
        |  CAST(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS has_grade,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 0
        |    THEN o_orderkey % 7 + o_custkey % 5 ELSE o_orderkey % 7 END) AS BIGINT)
        |    AS amount_sum,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN o_orderkey % 3 ELSE 0 END) AS BIGINT)
        |    AS qty2_sum,
        |  CAST(sum(o_orderkey % 11) AS BIGINT) AS map_qty_sum,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS uom_kg,
        |  'mongo' AS src_tag,
        |  CAST(1.0 AS DOUBLE) AS nested_meta_only,
        |  CAST(1.0 AS DOUBLE) AS paths_agree
        |FROM orders WHERE o_orderkey % 97 <> 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // CDC changelog: the oracle restates the NET interval effect —
    // appended-then-deleted rows emit nothing, pre-existing deleted
    // rows emit deletes, surviving appends emit inserts
    "q_cdc_read" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |ins AS (SELECT 'insert' AS _change_type, o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM o WHERE o_orderstatus = 'O' AND o_orderkey % 5 <> 0 GROUP BY 2),
        |del AS (SELECT 'delete' AS _change_type, o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM o WHERE o_orderstatus = 'F' AND o_orderkey % 5 = 0 GROUP BY 2)
        |SELECT * FROM (SELECT * FROM ins UNION ALL SELECT * FROM del)
        |ORDER BY _change_type, o_orderstatus""".stripMargin,
    // runtime join filtering: the oracle recomputes the join by
    // scanning, and pins pruned = 1.0 — the engine must have opened
    // exactly one of the four key-range dirs
    "q_runtime_filter" ->
      """WITH b AS (SELECT CAST(max(o_orderkey) // 4 AS BIGINT) AS b FROM orders),
        |dim AS (SELECT o_orderkey FROM orders, b
        |  WHERE o_orderkey <= b.b AND o_orderstatus = 'F'),
        |j AS (SELECT count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS rev
        |  FROM lineitem JOIN dim ON l_orderkey = o_orderkey)
        |SELECT 'n' AS metric, CAST(n AS DOUBLE) AS value FROM j
        |UNION ALL SELECT 'pruned', 1.0
        |UNION ALL SELECT 'revenue', rev FROM j
        |ORDER BY metric""".stripMargin,
    // metadata-only aggregates: the oracle recomputes every metric by
    // scanning, and pins meta_only = 1.0 — the engine must have
    // answered the unpredicated readout WITHOUT opening a data file
    "sql_stats_agg" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice FROM orders)
        |SELECT 'k_hi' AS metric, CAST(max(o_orderkey) AS DOUBLE) AS value FROM t
        |UNION ALL SELECT 'k_lo', CAST(min(o_orderkey) AS DOUBLE) FROM t
        |UNION ALL SELECT 'meta_only', 1.0
        |UNION ALL SELECT 'n_cheap', CAST(count(*) AS DOUBLE) FROM t WHERE o_totalprice < 150000.0
        |UNION ALL SELECT 'n_total', CAST(count(*) AS DOUBLE) FROM t
        |UNION ALL SELECT 'p_hi', CAST(max(o_totalprice) AS DOUBLE) FROM t
        |UNION ALL SELECT 'p_lo', CAST(min(o_totalprice) AS DOUBLE) FROM t
        |UNION ALL SELECT 's_key', CAST(sum(o_orderkey) AS DOUBLE) FROM t
        |UNION ALL SELECT 's_price', CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) FROM t
        |ORDER BY metric""".stripMargin,
    // grouped aggregate pushdown: the oracle recomputes the per-status
    // report by scanning and pins meta_only = 1.0 — the engine must
    // have answered the whole GROUP BY from partition metadata
    "sql_group_agg" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
        |  min(o_orderkey) AS k_lo, max(o_orderkey) AS k_hi,
        |  CAST(1.0 AS DOUBLE) AS meta_only
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sql_maintenance" ->
      """SELECT 'after_compact' AS at, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus IN ('F','O','P')
        |UNION ALL
        |SELECT 'after_rollback' AS at, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus IN ('F','O')
        |UNION ALL
        |SELECT 'final' AS at, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus IN ('F','O','P')
        |ORDER BY at""".stripMargin,
    "sql_hidden_partition" ->
      """WITH updated AS (
        |  SELECT event_type, ts,
        |    CASE WHEN event_type = 'purchase' THEN value * 2 ELSE value END AS value
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM updated
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q13_order_distribution" ->
      """WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_quantity" ->
      """WITH l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) qty, l_extendedprice FROM lineitem),
        |stats AS (SELECT l_partkey AS a_partkey, CAST(sum(qty) AS BIGINT) sum_qty, count(*) cnt
        |  FROM l GROUP BY l_partkey),
        |sel AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2' AND p_type = 'ECONOMY')
        |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
        |FROM l JOIN sel ON l_partkey = p_partkey JOIN stats ON l_partkey = a_partkey
        |WHERE 5 * qty * cnt < sum_qty""".stripMargin,
    "q14_promo_effect" ->
      """SELECT round(100.0
        |    * CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
        |  6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-02-01 00:00:00'""".stripMargin,
    "q19_discounted_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 35)""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH supply AS (SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |euro AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |sel AS (SELECT p_partkey, p_name FROM part WHERE p_size = 15 AND p_type = 'LARGE'),
        |joined AS (SELECT * FROM supply JOIN euro ON l_suppkey = s_suppkey
        |  JOIN sel ON l_partkey = p_partkey),
        |best AS (SELECT l_partkey AS b_partkey, min(supply_cost) AS best_cost
        |  FROM joined GROUP BY l_partkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
        |FROM joined JOIN best ON l_partkey = b_partkey AND supply_cost = best_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  round(CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
        |  6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY year(o_orderdate)
        |ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    - p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_stock" ->
      """WITH supplied AS (SELECT l_partkey, l_extendedprice
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7'),
        |per_part AS (SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
        |  FROM supplied GROUP BY l_partkey),
        |total AS (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 0.001
        |    AS threshold FROM supplied)
        |SELECT l_partkey, value FROM per_part, total
        |WHERE value > threshold
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_shipping_classes" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_parts_suppliers" ->
      """WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |kept AS (SELECT * FROM rel WHERE NOT EXISTS
        |  (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey AND s_acctbal < 0))
        |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM kept JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_part_promotion" ->
      """WITH supply AS (SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_partkey, l_suppkey),
        |totals AS (SELECT l_partkey AS t_partkey, sum(qty) AS total_qty
        |  FROM supply GROUP BY l_partkey),
        |dominant AS (SELECT DISTINCT l_suppkey FROM supply
        |  JOIN totals ON l_partkey = t_partkey WHERE 2 * qty > total_qty)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5'
        |  AND EXISTS (SELECT 1 FROM dominant WHERE l_suppkey = s_suppkey)
        |ORDER BY s_name""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH li AS (SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_order AS (SELECT l_orderkey AS g_orderkey,
        |    count(DISTINCT l_suppkey) AS nsupp,
        |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate
        |  FROM li GROUP BY l_orderkey),
        |target AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late)
        |SELECT s_name, count(*) AS numwait
        |FROM target
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN per_order ON l_orderkey = g_orderkey
        |WHERE n_name = 'NATION_1' AND nsupp >= 2 AND nlate = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "q22_sales_opportunity" ->
      """WITH cset AS (SELECT * FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        |avg_bal AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    AS avg_bal FROM cset WHERE c_acctbal > 0)
        |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cset, avg_bal
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_nationkey
        |ORDER BY cntrycode""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_returnflag = 'R'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15""".stripMargin,
    "q_distinct_agg" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_orderpriority) AS n_prio,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS F,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS O,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS P
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n_above,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_above
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM orders)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, user_id, ts, last_click_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    max(CASE WHEN event_type = 'click' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
        |  FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    // per-segment heavy hitters: decimal-exact rollup, double-cast
    // ranking with id tie-break — the bounded-heap top-5 restated as
    // a window
    "q_events_tophh" ->
      """WITH per AS (SELECT event_type, user_id,
        |  sum(CAST(value AS DECIMAL(18,6))) total FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, CAST(total AS DOUBLE) td,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY CAST(total AS DOUBLE) DESC, user_id) rnk FROM per)
        |SELECT event_type, user_id, rnk, round(td, 6) AS total FROM r WHERE rnk <= 5
        |ORDER BY event_type, rnk""".stripMargin,
    "q_events_retention" ->
      """WITH ev AS (SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        |  FROM events),
        |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, week FROM ev)
        |SELECT cohort_week,
        |  CAST(floor((CAST(floor(epoch(week)) AS BIGINT)
        |    - CAST(floor(epoch(cohort_week)) AS BIGINT)) / 604800) AS BIGINT) AS week_no,
        |  count(DISTINCT user_id) AS n_users
        |FROM active JOIN cohorts USING (user_id)
        |GROUP BY cohort_week, week_no
        |ORDER BY cohort_week, week_no""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,
    // stream-executed ingestion: the engine side ingests events via a
    // REAL AvailableNow streaming run (exactly-once appendOnce sink),
    // replays from a fresh checkpoint (same batch ids — the ledger
    // must no-op), then rolls up the INGESTED table; the oracle rolls
    // up the raw parquet — bit-equality pins lossless, duplicate-free,
    // value-exact streaming ingestion. exactly_once = replay invariance
    "stream_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  CAST(1.0 AS DOUBLE) AS exactly_once
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,
    // lake-to-lake tail through the DSv2 catalog (readStream.table):
    // bootstrap + delta + idle runs on one checkpoint; the silver
    // rollup must equal the raw rollup, exactly_once = idle-run
    // invariance (rows AND sink snapshots unchanged)
    "stream_spj_tail" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS exactly_once
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // lake-to-lake CDC replication: the replica's rollup after a
    // bootstrap + a catch-up batch netting (append, MoR UPDATE that
    // doubles price on okey%11=5, MoR DELETE of F-status okey%10=3) +
    // an idle run, restated straight from raw orders; replica_exact =
    // the replica's row multiset equals the primary's (hash-exact
    // reconstruction), exactly_once = idle-run invariance
    "stream_cdc_replicate" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(price) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS replica_exact,
        |  CAST(1.0 AS DOUBLE) AS exactly_once
        |FROM (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 5
        |      THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DECIMAL(12,2))
        |      ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS price
        |  FROM orders
        |  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
        |)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // TRUE streaming sessionization (flatMapGroupsWithState, event-time
    // timeouts, three file-source micro-batches with sentinel-driven
    // watermark flushes) must land bit-identically on the batch
    // window-function restatement — the same oracle SQL as
    // q_events_sessionize
    "stream_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_events_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_events_anomaly" ->
      """WITH e AS (SELECT event_id, user_id, value FROM events),
        |st AS (SELECT user_id, count(*) n,
        |    sum(CAST(value AS DECIMAL(18,6))) s1,
        |    sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) s2
        |  FROM e GROUP BY user_id),
        |m AS (SELECT user_id, CAST(s1 AS DOUBLE)/n AS mean,
        |    sqrt(greatest(CAST(s2 AS DOUBLE)/n
        |      - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 0.0)) AS std
        |  FROM st)
        |SELECT e.event_id, e.user_id, e.value,
        |  round((e.value - m.mean)/m.std, 4) AS zscore
        |FROM e JOIN m USING (user_id)
        |WHERE m.std > 0 AND abs(e.value - m.mean) > 2.5 * m.std
        |ORDER BY e.event_id""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_string_agg" ->
      """SELECT o_orderstatus,
        |  array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_set_ops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_custkey, 'both' AS tag FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
        |UNION ALL
        |SELECT o_custkey, 'f_only' AS tag FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q_range_join" ->
      """SELECT p.event_id, count(c.event_id) AS n_clicks_10m
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q_median_price" ->
      """WITH r AS (SELECT o_orderstatus, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) rn,
        |  count(*) OVER (PARTITION BY o_orderstatus) n
        |  FROM orders)
        |SELECT o_orderstatus,
        |  round(CAST(avg(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS median_price,
        |  max(n) AS n
        |FROM r WHERE rn = (n+1)//2 OR rn = n//2 + 1
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25""".stripMargin,
    "q_events_funnel" ->
      """WITH ta AS (SELECT user_id, min(ts) t_view FROM events WHERE event_type = 'view' GROUP BY 1),
        |tb AS (SELECT e.user_id, min(e.ts) t_click FROM events e JOIN ta ON e.user_id = ta.user_id
        |  WHERE e.event_type = 'click' AND e.ts > ta.t_view GROUP BY 1),
        |tc AS (SELECT e.user_id, min(e.ts) t_purchase FROM events e JOIN tb ON e.user_id = tb.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > tb.t_click GROUP BY 1)
        |SELECT ta.user_id,
        |  tb.user_id IS NOT NULL AS reached_click,
        |  tc.user_id IS NOT NULL AS reached_purchase
        |FROM ta LEFT JOIN tb ON ta.user_id = tb.user_id
        |LEFT JOIN tc ON ta.user_id = tc.user_id
        |ORDER BY ta.user_id""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey <= 200
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    // §2.C — deduplication. Shared fragments (SURVEY.md §3): tokens =
    // regexp_extract_all(lower(text),'([a-z0-9]+)',1); shingles =
    // distinct 3-token windows; h62(x) = md5_number_lower(x) // 4.
    "dedup_exact" ->
      """WITH d AS (SELECT doc_id,
        |  md5(array_to_string(regexp_extract_all(lower(text),'([a-z0-9]+)',1),' ')) gh
        |  FROM documents)
        |SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY gh) AS canonical_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY gh) AS is_dup
        |FROM d ORDER BY doc_id""".stripMargin,
    // asymmetric containment: directional pairs, denominator = the
    // SUB side's shingle count — the subset/superset relation Jaccard
    // can't see
    "dedup_containment" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM tk),
        |ss AS (SELECT doc_id, sh, len(sh) n_sh FROM s WHERE len(sh) > 0),
        |p AS (SELECT doc_id, unnest(sh) g0 FROM ss),
        |ph AS (SELECT doc_id, CAST(md5_number_lower(g0) // 4 AS BIGINT) g FROM p),
        |c AS (SELECT a.doc_id doc_sub, b.doc_id doc_super, count(*) common
        |  FROM ph a JOIN ph b ON a.g = b.g AND a.doc_id <> b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_sub, doc_super,
        |  round(CAST(common AS DOUBLE) / sa.n_sh, 6) containment
        |  FROM c JOIN ss sa ON c.doc_sub = sa.doc_id)
        |SELECT doc_sub, doc_super, containment FROM j WHERE containment >= 0.9
        |ORDER BY doc_sub, doc_super""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM tk),
        |ss AS (SELECT doc_id, sh, len(sh) n_sh FROM s WHERE len(sh) > 0),
        |p AS (SELECT doc_id, unnest(sh) g0 FROM ss),
        |ph AS (SELECT doc_id, CAST(md5_number_lower(g0) // 4 AS BIGINT) g FROM p),
        |c AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) common
        |  FROM ph a JOIN ph b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b,
        |  round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) jaccard
        |  FROM c JOIN ss sa ON c.doc_a = sa.doc_id JOIN ss sb ON c.doc_b = sb.doc_id)
        |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_components" ->
      """WITH RECURSIVE tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM tk),
        |ss AS (SELECT doc_id, sh, len(sh) n_sh FROM s WHERE len(sh) > 0),
        |p AS (SELECT doc_id, unnest(sh) g0 FROM ss),
        |ph AS (SELECT doc_id, CAST(md5_number_lower(g0) // 4 AS BIGINT) g FROM p),
        |c AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) common
        |  FROM ph a JOIN ph b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b,
        |  round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) jaccard
        |  FROM c JOIN ss sa ON c.doc_a = sa.doc_id JOIN ss sb ON c.doc_b = sb.doc_id),
        |e AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |ee AS (SELECT doc_a v, doc_b u FROM e UNION SELECT doc_b, doc_a FROM e),
        |reach(v, r) AS (
        |  SELECT v, v FROM (SELECT DISTINCT v FROM ee)
        |  UNION
        |  SELECT ee.v, reach.r FROM ee JOIN reach ON ee.u = reach.v),
        |comp AS (SELECT v doc_id, min(r) rep_id FROM reach GROUP BY v),
        |cs AS (SELECT rep_id, count(*) csize FROM comp GROUP BY rep_id)
        |SELECT doc_id, comp.rep_id, csize FROM comp JOIN cs USING (rep_id)
        |ORDER BY doc_id""".stripMargin,
    "dedup_minhash_lsh" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM tk),
        |ss AS (SELECT doc_id, sh, len(sh) n_sh FROM s WHERE len(sh) > 0),
        |seeds AS (SELECT r.range i,
        |  ((CAST(md5_number_lower('minhash-a|' || r.range::VARCHAR) // 4 AS BIGINT) % 2147483646) + 1) a,
        |  (CAST(md5_number_lower('minhash-b|' || r.range::VARCHAR) // 4 AS BIGINT) % 2147483647) b
        |  FROM range(0,16) r),
        |pg AS (SELECT doc_id, CAST(md5_number_lower(unnest(sh)) // 4 AS BIGINT) g FROM ss),
        |ph AS (SELECT doc_id, g % 2147483647 hp FROM pg),
        |sg AS (SELECT doc_id, i, min((a * hp + b) % 2147483647) m
        |  FROM ph CROSS JOIN seeds GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(m::VARCHAR ORDER BY i) sgl FROM sg GROUP BY 1),
        |bands AS (SELECT doc_id, unnest([{'band': b,
        |    'bkey': md5(array_to_string(sgl[b*4+1:b*4+4], ','))}
        |  for b in range(0,4)]) u FROM sig),
        |bb AS (SELECT doc_id, u.band band, u.bkey bkey FROM bands),
        |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        |  FROM bb a JOIN bb b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |cm AS (SELECT c.doc_a, c.doc_b, count(*) common FROM cand c
        |  JOIN pg a ON a.doc_id = c.doc_a JOIN pg b ON b.doc_id = c.doc_b AND b.g = a.g
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, count(*) n_sh FROM pg GROUP BY 1),
        |v AS (SELECT cm.doc_a, cm.doc_b, cm.common, sa.n_sh na, sb.n_sh nb FROM cm
        |  JOIN sz sa ON cm.doc_a = sa.doc_id JOIN sz sb ON cm.doc_b = sb.doc_id),
        |j AS (SELECT doc_a, doc_b, round(CAST(common AS DOUBLE) / (na + nb - common), 6) jaccard FROM v)
        |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // incremental-index oracle: the same doc-level MinHash-LSH recomputed
    // from scratch, kept only where a pair has a NEW (doc_id % 3 = 0) side
    "dedup_index_incremental" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM tk),
        |ss AS (SELECT doc_id, sh, len(sh) n_sh FROM s WHERE len(sh) > 0),
        |seeds AS (SELECT r.range i,
        |  ((CAST(md5_number_lower('minhash-a|' || r.range::VARCHAR) // 4 AS BIGINT) % 2147483646) + 1) a,
        |  (CAST(md5_number_lower('minhash-b|' || r.range::VARCHAR) // 4 AS BIGINT) % 2147483647) b
        |  FROM range(0,16) r),
        |pg AS (SELECT doc_id, CAST(md5_number_lower(unnest(sh)) // 4 AS BIGINT) g FROM ss),
        |ph AS (SELECT doc_id, g % 2147483647 hp FROM pg),
        |sg AS (SELECT doc_id, i, min((a * hp + b) % 2147483647) m
        |  FROM ph CROSS JOIN seeds GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(m::VARCHAR ORDER BY i) sgl FROM sg GROUP BY 1),
        |bands AS (SELECT doc_id, unnest([{'band': b,
        |    'bkey': md5(array_to_string(sgl[b*4+1:b*4+4], ','))}
        |  for b in range(0,4)]) u FROM sig),
        |bb AS (SELECT doc_id, u.band band, u.bkey bkey FROM bands),
        |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        |  FROM bb a JOIN bb b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |  AND (a.doc_id % 3 = 0 OR b.doc_id % 3 = 0)),
        |cm AS (SELECT c.doc_a, c.doc_b, count(*) common FROM cand c
        |  JOIN pg a ON a.doc_id = c.doc_a JOIN pg b ON b.doc_id = c.doc_b AND b.g = a.g
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, count(*) n_sh FROM pg GROUP BY 1),
        |v AS (SELECT cm.doc_a, cm.doc_b, cm.common, sa.n_sh na, sb.n_sh nb FROM cm
        |  JOIN sz sa ON cm.doc_a = sa.doc_id JOIN sz sb ON cm.doc_b = sb.doc_id),
        |j AS (SELECT doc_a, doc_b, round(CAST(common AS DOUBLE) / (na + nb - common), 6) jaccard FROM v)
        |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // admission oracle: full doc-level MinHash-LSH pairs -> recursive
    // components -> cluster-keep-one labels, singletons via left join
    "dedup_index_admission" ->
      """WITH RECURSIVE tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM tk),
        |ss AS (SELECT doc_id, sh, len(sh) n_sh FROM s WHERE len(sh) > 0),
        |seeds AS (SELECT r.range i,
        |  ((CAST(md5_number_lower('minhash-a|' || r.range::VARCHAR) // 4 AS BIGINT) % 2147483646) + 1) a,
        |  (CAST(md5_number_lower('minhash-b|' || r.range::VARCHAR) // 4 AS BIGINT) % 2147483647) b
        |  FROM range(0,16) r),
        |pg AS (SELECT doc_id, CAST(md5_number_lower(unnest(sh)) // 4 AS BIGINT) g FROM ss),
        |ph AS (SELECT doc_id, g % 2147483647 hp FROM pg),
        |sg AS (SELECT doc_id, i, min((a * hp + b) % 2147483647) m
        |  FROM ph CROSS JOIN seeds GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(m::VARCHAR ORDER BY i) sgl FROM sg GROUP BY 1),
        |bands AS (SELECT doc_id, unnest([{'band': b,
        |    'bkey': md5(array_to_string(sgl[b*4+1:b*4+4], ','))}
        |  for b in range(0,4)]) u FROM sig),
        |bb AS (SELECT doc_id, u.band band, u.bkey bkey FROM bands),
        |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        |  FROM bb a JOIN bb b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |cm AS (SELECT c.doc_a, c.doc_b, count(*) common FROM cand c
        |  JOIN pg a ON a.doc_id = c.doc_a JOIN pg b ON b.doc_id = c.doc_b AND b.g = a.g
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, count(*) n_sh FROM pg GROUP BY 1),
        |v AS (SELECT cm.doc_a, cm.doc_b, cm.common, sa.n_sh na, sb.n_sh nb FROM cm
        |  JOIN sz sa ON cm.doc_a = sa.doc_id JOIN sz sb ON cm.doc_b = sb.doc_id),
        |j AS (SELECT doc_a, doc_b, round(CAST(common AS DOUBLE) / (na + nb - common), 6) jaccard FROM v),
        |e AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |ee AS (SELECT doc_a v, doc_b u FROM e UNION SELECT doc_b, doc_a FROM e),
        |reach(v, r) AS (
        |  SELECT v, v FROM (SELECT DISTINCT v FROM ee)
        |  UNION
        |  SELECT ee.v, reach.r FROM ee JOIN reach ON ee.u = reach.v),
        |comp AS (SELECT v doc_id, min(r) rep_id FROM reach GROUP BY v)
        |SELECT d.doc_id, coalesce(comp.rep_id, d.doc_id) AS canonical_id,
        |  d.doc_id = coalesce(comp.rep_id, d.doc_id) AS keep
        |FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "dedup_simhash" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |e AS (SELECT doc_id, toks, list_distinct(toks) dt FROM tk WHERE len(toks) > 0),
        |en AS (SELECT doc_id, [{'h': CAST(md5_number_lower(t) // 4 AS BIGINT),
        |    'c': CAST(len(list_filter(toks, x -> x = t)) AS BIGINT)} for t in dt] entries FROM e),
        |sm AS (SELECT doc_id, CAST(list_sum([CASE WHEN list_sum([e2.c *
        |      (CASE WHEN ((e2.h >> b) & 1) = 1 THEN 1 ELSE -1 END) for e2 in entries]) >= 0
        |    THEN (1::BIGINT << b) ELSE 0::BIGINT END for b in range(0,48)]) AS BIGINT) sim FROM en),
        |banded AS (SELECT doc_id, sim,
        |  unnest([{'band': k, 'bval': (sim >> (k*12)) & 4095} for k in range(0,4)]) u FROM sm),
        |bb AS (SELECT doc_id, sim, u.band band, u.bval bval FROM banded),
        |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b, a.sim sim_a, b.sim sim_b
        |  FROM bb a JOIN bb b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming FROM cand
        |WHERE bit_count(xor(sim_a, sim_b)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "pipeline_decontaminate_semantic" ->
      """WITH q AS (SELECT vec_id,
        |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
        |h AS (SELECT * FROM q WHERE vec_id % 97 = 0),
        |t AS (SELECT * FROM q WHERE vec_id % 97 <> 0),
        |c AS (SELECT DISTINCT t.vec_id FROM t JOIN h ON
        |  round(CAST(list_sum(list_transform(list_zip(t.v, h.v), z -> z[1]*z[2])) AS DOUBLE)
        |    / sqrt(CAST(list_sum(list_transform(t.v, x -> x*x))
        |           * list_sum(list_transform(h.v, x -> x*x)) AS DOUBLE)), 6) >= 0.35)
        |SELECT vec_id FROM t ANTI JOIN c USING (vec_id)
        |ORDER BY vec_id""".stripMargin,
    "dedup_embedding" ->
      """WITH q AS (SELECT vec_id,
        |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
        |planes AS (SELECT r1.range t, r2.range p, r3.range d,
        |  ((CAST(md5_number_lower(r1.range::VARCHAR || '_' || r2.range::VARCHAR || '_' || r3.range::VARCHAR) // 4 AS BIGINT) & 1)*2 - 1) sgn
        |  FROM range(0,4) r1, range(0,6) r2, range(0,64) r3),
        |ev AS (SELECT vec_id, unnest(v) val, unnest(range(0, len(v))) d FROM q),
        |dots AS (SELECT e.vec_id, pl.t, pl.p, sum(e.val * pl.sgn) s
        |  FROM ev e JOIN planes pl ON e.d = pl.d GROUP BY 1, 2, 3),
        |bb AS (SELECT vec_id, t, CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END) AS BIGINT) bucket
        |  FROM dots GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id vec_a, b.vec_id vec_b
        |  FROM bb a JOIN bb b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |p AS (SELECT vec_a, vec_b,
        |  round(CAST(list_sum(list_transform(list_zip(av.v, bv.v), z -> z[1]*z[2])) AS DOUBLE)
        |    / sqrt(CAST(list_sum(list_transform(av.v, x -> x*x))
        |           * list_sum(list_transform(bv.v, x -> x*x)) AS DOUBLE)), 6) cosine
        |  FROM cand JOIN q av ON cand.vec_a = av.vec_id JOIN q bv ON cand.vec_b = bv.vec_id)
        |SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    // §2.D — similarity search
    "ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id,
        |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
        |s AS (SELECT qq.vec_id q_id, e.vec_id vec_id,
        |  round(CAST(list_sum(list_transform(list_zip(qq.v, e.v), z -> z[1]*z[2])) AS DOUBLE)
        |    / sqrt(CAST(list_sum(list_transform(qq.v, x -> x*x))
        |           * list_sum(list_transform(e.v, x -> x*x)) AS DOUBLE)), 6) cosine
        |  FROM (SELECT * FROM q WHERE vec_id < 5) qq CROSS JOIN q e),
        |r AS (SELECT q_id, vec_id, cosine,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM s)
        |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
        |ORDER BY q_id, rnk""".stripMargin,
    "ann_filtered_topk" ->
      """WITH q AS (SELECT vec_id, label,
        |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
        |qn AS (SELECT vec_id, label, v, list_sum(list_transform(v, x -> x*x)) nsq FROM q),
        |s AS (SELECT qv.vec_id q_id, ev.vec_id vec_id,
        |  round(CAST(list_sum(list_transform(list_zip(qv.v, ev.v), z -> z[1]*z[2])) AS DOUBLE)
        |    / sqrt(CAST(qv.nsq * ev.nsq AS DOUBLE)), 6) cosine
        |  FROM qn qv JOIN qn ev ON qv.label = ev.label
        |  WHERE qv.vec_id < 5),
        |r AS (SELECT q_id, vec_id, cosine,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM s)
        |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
        |ORDER BY q_id, rnk""".stripMargin,
    "ann_bq_rerank" ->
      """WITH q AS (SELECT vec_id,
        |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
        |qn AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) nsq FROM q),
        |hs AS (SELECT qq.vec_id q_id, e.vec_id vec_id,
        |  list_sum(list_transform(list_zip(qq.v, e.v),
        |    z -> CASE WHEN (z[1] >= 0) <> (z[2] >= 0) THEN 1 ELSE 0 END)) ham
        |  FROM (SELECT * FROM q WHERE vec_id < 5) qq CROSS JOIN q e),
        |sr AS (SELECT q_id, vec_id,
        |  row_number() OVER (PARTITION BY q_id ORDER BY ham ASC, vec_id) srk FROM hs),
        |short AS (SELECT q_id, vec_id FROM sr WHERE srk <= 50),
        |ex AS (SELECT s.q_id, s.vec_id,
        |    round(CAST(list_sum(list_transform(list_zip(qv.v, ev.v), z -> z[1]*z[2])) AS DOUBLE)
        |      / sqrt(CAST(qv.nsq * ev.nsq AS DOUBLE)), 6) cosine
        |  FROM short s JOIN qn qv ON s.q_id = qv.vec_id JOIN qn ev ON s.vec_id = ev.vec_id),
        |r AS (SELECT q_id, vec_id, cosine,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM ex)
        |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
        |ORDER BY q_id, rnk""".stripMargin,
    // hybrid retrieval: both legs and the rank fusion restate fully
    // in SQL — keyword overlap ranks, cosine ranks, RRF sum
    "hybrid_search_rrf" ->
      """WITH toks AS (SELECT doc_id,
        |  list_distinct(regexp_extract_all(lower(text),'([a-z0-9]+)',1)) dt FROM documents),
        |qt AS (SELECT doc_id q_id, dt qt FROM toks WHERE doc_id < 5),
        |ts AS (SELECT q.q_id, t.doc_id, len(list_intersect(t.dt, q.qt)) s
        |  FROM toks t CROSS JOIN qt q),
        |trank AS (SELECT q_id, doc_id,
        |  row_number() OVER (PARTITION BY q_id ORDER BY s DESC, doc_id) rt
        |  FROM ts WHERE s > 0 QUALIFY rt <= 20),
        |v AS (SELECT vec_id,
        |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
        |vs AS (SELECT qq.vec_id q_id, e.vec_id doc_id,
        |  round(CAST(list_sum(list_transform(list_zip(qq.v, e.v), z -> z[1]*z[2])) AS DOUBLE)
        |    / sqrt(CAST(list_sum(list_transform(qq.v, x -> x*x))
        |           * list_sum(list_transform(e.v, x -> x*x)) AS DOUBLE)), 6) c
        |  FROM (SELECT * FROM v WHERE vec_id < 5) qq CROSS JOIN v e),
        |vrank AS (SELECT q_id, doc_id,
        |  row_number() OVER (PARTITION BY q_id ORDER BY c DESC, doc_id) rv
        |  FROM vs QUALIFY rv <= 20),
        |fused AS (SELECT coalesce(t.q_id, w.q_id) q_id, coalesce(t.doc_id, w.doc_id) doc_id,
        |  round(coalesce(1.0/(60 + t.rt), 0) + coalesce(1.0/(60 + w.rv), 0), 6) rrf
        |  FROM trank t FULL JOIN vrank w ON t.q_id = w.q_id AND t.doc_id = w.doc_id),
        |r AS (SELECT q_id, doc_id, rrf,
        |  row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) rnk FROM fused)
        |SELECT q_id, doc_id AS vec_id, rnk, rrf FROM r WHERE rnk <= 10
        |ORDER BY q_id, rnk""".stripMargin,
    // graph-index ANN: the NSW build/search loop is not SQL — the
    // oracle restates the sf0.01 answer as VALUES (trained-artifact
    // pattern); AnnNswSpec measures recall vs the exact scan and pins
    // bit-reproducibility across runs
    "ann_nsw_topk" ->
      """SELECT CAST(q_id AS BIGINT) AS q_id, CAST(vec_id AS BIGINT) AS vec_id,
        |  rnk, CAST(cosine AS DOUBLE) AS cosine FROM (VALUES
        |  (0, 0, 1, 1.0), (0, 365, 2, 0.370392), (0, 334, 3, 0.362775),
        |  (0, 423, 4, 0.296746), (0, 73, 5, 0.29552), (0, 7, 6, 0.292983),
        |  (0, 320, 7, 0.288049), (0, 190, 8, 0.281365), (0, 464, 9, 0.276236),
        |  (0, 388, 10, 0.275971),
        |  (1, 1, 1, 1.0), (1, 386, 2, 0.372283), (1, 27, 3, 0.348413),
        |  (1, 407, 4, 0.327663), (1, 195, 5, 0.323173), (1, 64, 6, 0.316572),
        |  (1, 124, 7, 0.303011), (1, 402, 8, 0.292964), (1, 472, 9, 0.292773),
        |  (1, 220, 10, 0.290716),
        |  (2, 2, 1, 1.0), (2, 117, 2, 0.318476), (2, 450, 3, 0.265179),
        |  (2, 145, 4, 0.264041), (2, 188, 5, 0.262773), (2, 320, 6, 0.254426),
        |  (2, 418, 7, 0.253569), (2, 471, 8, 0.246024), (2, 112, 9, 0.245442),
        |  (2, 350, 10, 0.23901),
        |  (3, 3, 1, 1.0), (3, 130, 2, 0.400629), (3, 149, 3, 0.330253),
        |  (3, 343, 4, 0.308284), (3, 174, 5, 0.304197), (3, 231, 6, 0.298219),
        |  (3, 207, 7, 0.292056), (3, 192, 8, 0.291769), (3, 315, 9, 0.285262),
        |  (3, 437, 10, 0.280923),
        |  (4, 4, 1, 1.0), (4, 114, 2, 0.398042), (4, 496, 3, 0.340545),
        |  (4, 408, 4, 0.322698), (4, 482, 5, 0.313795), (4, 249, 6, 0.279728),
        |  (4, 280, 7, 0.279573), (4, 257, 8, 0.271366), (4, 89, 9, 0.265562),
        |  (4, 470, 10, 0.252931)
        |) AS t(q_id, vec_id, rnk, cosine)
        |ORDER BY q_id, rnk""".stripMargin,
    "ann_lsh_bucketed" ->
      """WITH q AS (SELECT vec_id,
        |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
        |planes AS (SELECT r1.range t, r2.range p, r3.range d,
        |  ((CAST(md5_number_lower(r1.range::VARCHAR || '_' || r2.range::VARCHAR || '_' || r3.range::VARCHAR) // 4 AS BIGINT) & 1)*2 - 1) sgn
        |  FROM range(0,4) r1, range(0,6) r2, range(0,64) r3),
        |ev AS (SELECT vec_id, unnest(v) val, unnest(range(0, len(v))) d FROM q),
        |dots AS (SELECT e.vec_id, pl.t, pl.p, sum(e.val * pl.sgn) s
        |  FROM ev e JOIN planes pl ON e.d = pl.d GROUP BY 1, 2, 3),
        |bb AS (SELECT vec_id, t, CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END) AS BIGINT) bucket
        |  FROM dots GROUP BY 1, 2),
        |qb AS (SELECT vec_id q_id, t, bucket FROM bb WHERE vec_id < 5),
        |cand AS (SELECT DISTINCT q_id, bb.vec_id vec_id FROM qb JOIN bb ON qb.t = bb.t AND qb.bucket = bb.bucket),
        |s AS (SELECT q_id, cand.vec_id,
        |  round(CAST(list_sum(list_transform(list_zip(qv.v, ev.v), z -> z[1]*z[2])) AS DOUBLE)
        |    / sqrt(CAST(list_sum(list_transform(qv.v, x -> x*x))
        |           * list_sum(list_transform(ev.v, x -> x*x)) AS DOUBLE)), 6) cosine
        |  FROM cand JOIN q qv ON cand.q_id = qv.vec_id JOIN q ev ON cand.vec_id = ev.vec_id),
        |r AS (SELECT q_id, vec_id, cosine,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM s)
        |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
        |ORDER BY q_id, rnk""".stripMargin,
    "ann_lsh_multiprobe" ->
      """WITH q AS (SELECT vec_id,
        |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
        |planes AS (SELECT r1.range t, r2.range p, r3.range d,
        |  ((CAST(md5_number_lower(r1.range::VARCHAR || '_' || r2.range::VARCHAR || '_' || r3.range::VARCHAR) // 4 AS BIGINT) & 1)*2 - 1) sgn
        |  FROM range(0,4) r1, range(0,6) r2, range(0,64) r3),
        |ev AS (SELECT vec_id, unnest(v) val, unnest(range(0, len(v))) d FROM q),
        |dots AS (SELECT e.vec_id, pl.t, pl.p, sum(e.val * pl.sgn) s
        |  FROM ev e JOIN planes pl ON e.d = pl.d GROUP BY 1, 2, 3),
        |bb AS (SELECT vec_id, t, CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END) AS BIGINT) bucket
        |  FROM dots GROUP BY 1, 2),
        |qb AS (SELECT vec_id q_id, t,
        |  unnest([bucket] || [xor(bucket, (1::BIGINT << pp)) for pp in range(0,6)]) bucket
        |  FROM bb WHERE vec_id < 5),
        |cand AS (SELECT DISTINCT q_id, bb.vec_id vec_id FROM qb JOIN bb ON qb.t = bb.t AND qb.bucket = bb.bucket),
        |s AS (SELECT q_id, cand.vec_id,
        |  round(CAST(list_sum(list_transform(list_zip(qv.v, ev.v), z -> z[1]*z[2])) AS DOUBLE)
        |    / sqrt(CAST(list_sum(list_transform(qv.v, x -> x*x))
        |           * list_sum(list_transform(ev.v, x -> x*x)) AS DOUBLE)), 6) cosine
        |  FROM cand JOIN q qv ON cand.q_id = qv.vec_id JOIN q ev ON cand.vec_id = ev.vec_id),
        |r AS (SELECT q_id, vec_id, cosine,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM s)
        |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
        |ORDER BY q_id, rnk""".stripMargin,
    "ann_ivf_topk" ->
      """WITH q AS (SELECT vec_id,
        |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
        |qn AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) nsq FROM q),
        |cents AS (SELECT vec_id cent_id, v cv, nsq cn FROM qn WHERE vec_id < 8),
        |da AS (SELECT e.vec_id, c.cent_id,
        |  CAST(e.nsq + c.cn - 2 * list_sum(list_transform(list_zip(e.v, c.cv), z -> z[1]*z[2])) AS BIGINT) d2
        |  FROM qn e CROSS JOIN cents c),
        |ranked AS (SELECT vec_id, cent_id,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) crk FROM da),
        |assign AS (SELECT vec_id, cent_id cell FROM ranked WHERE crk = 1),
        |probes AS (SELECT vec_id q_id, cent_id cell FROM ranked WHERE crk <= 2 AND vec_id < 5),
        |cand AS (SELECT DISTINCT q_id, assign.vec_id FROM probes JOIN assign ON probes.cell = assign.cell),
        |s AS (SELECT q_id, cand.vec_id,
        |  round(CAST(list_sum(list_transform(list_zip(qv.v, ev.v), z -> z[1]*z[2])) AS DOUBLE)
        |    / sqrt(CAST(qv.nsq * ev.nsq AS DOUBLE)), 6) cosine
        |  FROM cand JOIN qn qv ON cand.q_id = qv.vec_id JOIN qn ev ON cand.vec_id = ev.vec_id),
        |r AS (SELECT q_id, vec_id, cosine,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM s)
        |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
        |ORDER BY q_id, rnk""".stripMargin,
    // §2.E — text analysis
    "pipeline_decontaminate" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM tk),
        |ph AS (SELECT doc_id, CAST(md5_number_lower(unnest(sh)) // 4 AS BIGINT) g FROM s),
        |hold AS (SELECT DISTINCT g FROM ph WHERE doc_id % 97 = 0),
        |contam AS (SELECT DISTINCT ph.doc_id FROM ph JOIN hold ON ph.g = hold.g
        |  WHERE ph.doc_id % 97 <> 0)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contam)
        |ORDER BY doc_id""".stripMargin,
    // per-epoch salted permutations: each epoch is its own one-window
    // restatement
    "pipeline_epochs" ->
      """SELECT 0 AS epoch, row_number() OVER (
        |    ORDER BY CAST(md5_number_lower('epoch0|' || doc_id::VARCHAR) // 4 AS BIGINT),
        |             doc_id) AS pos, doc_id
        |FROM documents
        |UNION ALL
        |SELECT 1, row_number() OVER (
        |    ORDER BY CAST(md5_number_lower('epoch1|' || doc_id::VARCHAR) // 4 AS BIGINT),
        |             doc_id), doc_id
        |FROM documents
        |ORDER BY epoch, pos""".stripMargin,
    // global shuffle: the oracle is the ONE-WINDOW restatement of the
    // range-sharded position assignment (shard-by-top-bits preserves
    // key order, so the two are equal by construction)
    "pipeline_shuffle" ->
      """SELECT row_number() OVER (
        |    ORDER BY CAST(md5_number_lower('shuffle|' || doc_id::VARCHAR) // 4 AS BIGINT),
        |             doc_id) AS pos,
        |  doc_id
        |FROM documents ORDER BY pos""".stripMargin,
    "pipeline_sample" ->
      """WITH t AS (SELECT doc_id,
        |  list_distinct(regexp_extract_all(lower(text),'([a-z0-9]+)',1)) dt FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_intersect(dt, ['the','and','of','to','a','in','is','you','that','it'])) AS s_en,
        |  len(list_intersect(dt, ['el','la','de','que','y','en','un','los','se','no'])) AS s_es,
        |  len(list_intersect(dt, ['le','la','de','et','les','des','en','un','du','une'])) AS s_fr,
        |  len(list_intersect(dt, ['der','die','und','in','den','von','zu','das','mit','sich'])) AS s_de
        |  FROM t),
        |l AS (SELECT doc_id,
        |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
        |       WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
        |       WHEN s_de > 0 THEN 'de' ELSE 'und' END AS pred_lang FROM s)
        |SELECT doc_id, pred_lang FROM l
        |WHERE CAST(md5_number_lower('sample|' || doc_id::VARCHAR) // 4 AS BIGINT) % 1000
        |  < CASE WHEN pred_lang = 'en' THEN 250 ELSE 1000 END
        |ORDER BY doc_id""".stripMargin,
    "pipeline_mix_temperature" ->
      """WITH t AS (SELECT doc_id,
        |  list_distinct(regexp_extract_all(lower(text),'([a-z0-9]+)',1)) dt FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_intersect(dt, ['the','and','of','to','a','in','is','you','that','it'])) AS s_en,
        |  len(list_intersect(dt, ['el','la','de','que','y','en','un','los','se','no'])) AS s_es,
        |  len(list_intersect(dt, ['le','la','de','et','les','des','en','un','du','une'])) AS s_fr,
        |  len(list_intersect(dt, ['der','die','und','in','den','von','zu','das','mit','sich'])) AS s_de
        |  FROM t),
        |l AS (SELECT doc_id,
        |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
        |       WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
        |       WHEN s_de > 0 THEN 'de' ELSE 'und' END AS pred_lang FROM s),
        |cnt AS (SELECT pred_lang, count(*) c FROM l GROUP BY pred_lang),
        |mn AS (SELECT min(c) cmin FROM cnt),
        |th AS (SELECT pred_lang,
        |  CAST(round(pow(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE), 0.5) * 1000000.0, 0) AS BIGINT) kth
        |  FROM cnt CROSS JOIN mn)
        |SELECT l.doc_id, l.pred_lang FROM l JOIN th USING (pred_lang)
        |WHERE CAST(md5_number_lower('mix|' || doc_id::VARCHAR) // 4 AS BIGINT) % 1000000 < kth
        |ORDER BY doc_id""".stripMargin,
    "pipeline_pack" ->
      """WITH t AS (SELECT doc_id,
        |  len(regexp_extract_all(lower(text),'([a-z0-9]+)',1)) n_tok,
        |  CAST(floor(doc_id / 1000.0) AS BIGINT) blk FROM documents),
        |c AS (SELECT doc_id, n_tok, blk,
        |  sum(n_tok) OVER (PARTITION BY blk ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM t)
        |SELECT blk, CAST(floor((cum - n_tok) / 4096.0) AS BIGINT) AS win,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens
        |FROM c GROUP BY blk, win
        |ORDER BY blk, win""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id,
        |  list_distinct(regexp_extract_all(lower(text),'([a-z0-9]+)',1)) dt FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_intersect(dt, ['the','and','of','to','a','in','is','you','that','it'])) AS s_en,
        |  len(list_intersect(dt, ['el','la','de','que','y','en','un','los','se','no'])) AS s_es,
        |  len(list_intersect(dt, ['le','la','de','et','les','des','en','un','du','une'])) AS s_fr,
        |  len(list_intersect(dt, ['der','die','und','in','den','von','zu','das','mit','sich'])) AS s_de
        |  FROM t)
        |SELECT doc_id, s_en, s_es, s_fr, s_de,
        |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
        |       WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
        |       WHEN s_de > 0 THEN 'de' ELSE 'und' END AS pred_lang
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, length(text) n_chars,
        |  regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks,
        |  len(regexp_extract_all(text, '([^a-z0-9 ])', 1)) n_punct FROM documents),
        |u AS (SELECT doc_id, n_chars, n_punct, len(toks) n_tokens,
        |  len(list_filter(toks, tk -> list_contains(['the','and','of','to','a','in','is','you','that','it'], tk))) n_stop,
        |  list_sum(list_transform(toks, tk -> length(tk))) tok_chars FROM t)
        |SELECT doc_id, n_chars, n_tokens,
        |  round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
        |  round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
        |  round(CAST(tok_chars AS DOUBLE) / n_tokens, 6) AS mean_tok_len,
        |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
        |    + 0.3 * (1.0 - least(1.0, 10.0 * CAST(n_punct AS DOUBLE) / n_chars))
        |    + 0.3 * least(1.0, 5.0 * CAST(n_stop AS DOUBLE) / n_tokens), 6) AS quality
        |FROM u ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, length(text) AS n_chars, octet_length(encode(text)) AS n_bytes,
        |  len(regexp_extract_all(text, '(\S+)', 1)) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '([a-z0-9]+)', 1)) AS word_tokens,
        |  len(regexp_extract_all(lower(text), '([a-z]+|[0-9]|[^a-z0-9\s])', 1)) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_top_ngrams" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM tk),
        |e AS (SELECT unnest(sh) shingle FROM s)
        |SELECT shingle, count(*) AS doc_freq FROM e
        |GROUP BY shingle ORDER BY doc_freq DESC, shingle LIMIT 50""".stripMargin,
    "text_fingerprint" ->
      """WITH t AS (SELECT doc_id,
        |  array_to_string(regexp_extract_all(lower(text),'([a-z0-9]+)',1), ' ') nt,
        |  regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents)
        |SELECT doc_id, md5(nt) AS fp_md5,
        |  CAST(md5_number_lower(nt) // 4 AS BIGINT) AS fp_h62,
        |  len(CASE WHEN len(toks)<3 THEN []
        |    ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END) AS n_shingles
        |FROM t ORDER BY doc_id""".stripMargin,
    // §2.F — multimodal
    // every sampled frame's exact bytes pinned by md5; the oracle
    // slices TEXT (ASCII corpus: byte == char slicing, spec-asserted)
    "multimodal_framehash" ->
      """SELECT doc_id, u.no AS frame_no, u.m AS frame_md5 FROM (
        |  SELECT doc_id, unnest([{'no': i, 'm': md5(substring(text, 1 + i*64, 16))}
        |    for i in range(0, (length(text)-1)//64 + 1)]) u FROM documents) f
        |ORDER BY doc_id, frame_no""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS content_md5,
        |  lower(substr(hex(encode(text)), 1, 16)) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "pipeline_perplexity_filter" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |t AS (SELECT doc_id, unnest(toks) tok FROM tk),
        |f AS (SELECT tok, count(*) tf FROM t GROUP BY tok),
        |tt AS (SELECT sum(tf) tt FROM f),
        |sc AS (SELECT doc_id, count(*) n_tokens,
        |  round(avg(-log2(CAST(tf AS DOUBLE) / CAST(tt AS DOUBLE))), 6) mean_nll
        |  FROM t JOIN f USING (tok) CROSS JOIN tt GROUP BY doc_id),
        |s AS (SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
        |  coalesce(mean_nll, 0.0) AS mean_nll,
        |  CAST(floor(coalesce(mean_nll, 0.0) * 100) AS BIGINT) AS cb
        |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
        |h AS (SELECT cb, count(*) c FROM s GROUP BY cb),
        |w AS (SELECT cb, sum(c) OVER (ORDER BY cb ROWS UNBOUNDED PRECEDING) cum,
        |  (SELECT count(*) FROM s) n FROM h),
        |lo AS (SELECT min(cb) v FROM w WHERE cum >= n * 0.10),
        |hi AS (SELECT min(cb) v FROM w WHERE cum >= n * 0.90)
        |SELECT doc_id, n_tokens, mean_nll FROM s
        |WHERE cb > (SELECT v FROM lo) AND cb <= (SELECT v FROM hi)
        |ORDER BY doc_id""".stripMargin,
    "text_unigram_logprob" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |t AS (SELECT doc_id, unnest(toks) tok FROM tk),
        |f AS (SELECT tok, count(*) tf FROM t GROUP BY tok),
        |tt AS (SELECT sum(tf) tt FROM f),
        |sc AS (SELECT doc_id, count(*) n_tokens,
        |  round(avg(-log2(CAST(tf AS DOUBLE) / CAST(tt AS DOUBLE))), 6) mean_nll
        |  FROM t JOIN f USING (tok) CROSS JOIN tt GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
        |  coalesce(mean_nll, 0.0) AS mean_nll
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_rep_ngrams" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(greatest(len(toks) - 2, 0) AS BIGINT) n_ngrams,
        |  CAST(len(CASE WHEN len(toks)<3 THEN []
        |    ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END) AS BIGINT) n_distinct
        |  FROM tk)
        |SELECT doc_id, n_ngrams, n_distinct,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_ngrams, 6) AS rep_ratio
        |FROM s WHERE n_ngrams > 0
        |ORDER BY doc_id""".stripMargin,
    "text_chunk" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) ts FROM documents),
        |nz AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) n FROM tk WHERE len(ts) > 0),
        |c AS (SELECT doc_id, ts, n,
        |  1 + (greatest(n - 16, 0) + 11) // 12 AS nc FROM nz),
        |ex AS (SELECT doc_id, ts, n, unnest(range(0, nc)) AS chunk_no FROM c)
        |SELECT doc_id, chunk_no,
        |  CAST(least(16, n - chunk_no * 12) AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(ts[chunk_no*12+1 : chunk_no*12+16], ' ')) AS chunk_md5
        |FROM ex ORDER BY doc_id, chunk_no""".stripMargin,
    // per-doc tf·idf keywords: integer-ratio log2 (the
    // unigram_logprob precedent), lexicographic tie-break
    "text_tfidf_keywords" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks FROM documents),
        |t AS (SELECT doc_id, unnest(toks) tok FROM tk),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) tf FROM t GROUP BY 1, 2),
        |df AS (SELECT tok, CAST(count(*) AS BIGINT) df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) n_docs FROM tk),
        |sc AS (SELECT doc_id, tok,
        |  round(CAST(tf AS DOUBLE) * log2(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) score
        |  FROM tf JOIN df USING (tok) CROSS JOIN n),
        |r AS (SELECT doc_id, tok, score,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) rnk FROM sc)
        |SELECT doc_id, rnk, tok, score FROM r WHERE rnk <= 5
        |ORDER BY doc_id, rnk""".stripMargin,
    // BPE training is iterative (argmax per merge) — not expressible
    // as one SQL query, so the oracle restates the sf0.01-learned
    // rules as literal VALUES (the trained-artifact oracle pattern,
    // same as ann_ivf_trained): a hash match proves the distributed
    // trainer reproduces them bit-exactly. BpeSpec independently
    // re-derives the rules with an in-memory reference implementation.
    "text_bpe_train" ->
      """SELECT rank, lhs, rhs, CAST(n AS BIGINT) AS n FROM (VALUES
        |  (0, 'e', 'r', 4568), (1, 'i', 'n', 2760), (2, 'o', 'w', 2747),
        |  (3, 'o', 'r', 2696), (4, 's', 't', 2676), (5, 'm', 'er', 1852),
        |  (6, 'a', 't', 1845), (7, 'l', 'u', 1831), (8, 'a', 'r', 1758),
        |  (9, 'p', 'ar', 1758), (10, 'j', 'o', 964), (11, 'jo', 'in', 964),
        |  (12, 'a', 's', 947), (13, 'as', 'h', 947), (14, 'h', 'ash', 947),
        |  (15, 'r', 'ow', 943), (16, 'at', 'c', 937), (17, 'atc', 'h', 937),
        |  (18, 'b', 'atch', 937), (19, 'a', 'n', 936), (20, 'c', 'an', 936),
        |  (21, 's', 'can', 936), (22, 'c', 'o', 934), (23, 'c', 'u', 934),
        |  (24, 'co', 'lu', 934), (25, 'colu', 'm', 934), (26, 'colum', 'n', 934),
        |  (27, 'cu', 'st', 934), (28, 'cust', 'o', 934), (29, 'custo', 'mer', 934),
        |  (30, 'f', 'i', 933), (31, 'fi', 'l', 933)
        |) AS t(rank, lhs, rhs, n) ORDER BY rank""".stripMargin,
    "text_bpe_encode" ->
      """SELECT CAST(500 AS BIGINT) AS n_docs, CAST(27165 AS BIGINT) AS n_tokens,
        |  CAST(77349 AS BIGINT) AS n_bpe""".stripMargin,
    "text_collocations" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) ts FROM documents),
        |nz AS (SELECT doc_id, ts FROM tk WHERE len(ts) > 0),
        |nd AS (SELECT count(*) AS n_docs FROM nz),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(ts) < 2 THEN []
        |  ELSE list_distinct([array_to_string(ts[i:i+1],' ') for i in range(1, len(ts))]) END) AS bigram
        |  FROM nz),
        |bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS df_ab FROM bg GROUP BY 1
        |  HAVING count(*) >= 5),
        |ug AS (SELECT doc_id, unnest(list_distinct(ts)) AS w FROM nz),
        |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS df_w FROM ug GROUP BY 1)
        |SELECT bigram, df_ab, a.df_w AS df_a, b.df_w AS df_b,
        |  round(CAST(df_ab AS DOUBLE) * CAST(n_docs AS DOUBLE)
        |    / (CAST(a.df_w AS DOUBLE) * CAST(b.df_w AS DOUBLE)), 6) AS lift
        |FROM bc JOIN uc a ON split_part(bigram, ' ', 1) = a.w
        |  JOIN uc b ON split_part(bigram, ' ', 2) = b.w
        |  CROSS JOIN nd
        |ORDER BY lift DESC, bigram LIMIT 50""".stripMargin,
    "sketch_distinct_ngrams" ->
      """WITH tk AS (SELECT source, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks
        |  FROM documents),
        |s AS (SELECT source, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)])
        |  END sh FROM tk),
        |g AS (SELECT source, unnest(sh) g0 FROM s),
        |h AS (SELECT DISTINCT source, CAST(md5_number_lower(g0) // 4 AS BIGINT) h FROM g),
        |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) rk FROM h),
        |agg AS (SELECT source, CAST(max(rk) AS BIGINT) n_mins,
        |    max(CASE WHEN rk = 128 THEN h END) h_k
        |  FROM r WHERE rk <= 128 GROUP BY source)
        |SELECT source, n_mins,
        |  CASE WHEN n_mins < 128 THEN CAST(n_mins AS DOUBLE)
        |    ELSE round(127.0 * 4611686018427387904.0 / CAST(h_k AS DOUBLE), 3)
        |  END AS est_distinct
        |FROM agg ORDER BY source""".stripMargin,
    "sketch_source_overlap" ->
      """WITH tk AS (SELECT source, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks
        |  FROM documents),
        |s AS (SELECT source, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)])
        |  END sh FROM tk),
        |g AS (SELECT source, unnest(sh) g0 FROM s),
        |h AS (SELECT DISTINCT source, CAST(md5_number_lower(g0) // 4 AS BIGINT) h FROM g),
        |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) rk FROM h),
        |mins AS (SELECT source, list(h ORDER BY h) mins FROM r WHERE rk <= 128 GROUP BY source),
        |p AS (SELECT a.source src_a, b.source src_b,
        |    list_sort(list_distinct(a.mins || b.mins))[1:128] u, a.mins am, b.mins bm
        |  FROM mins a JOIN mins b ON a.source < b.source)
        |SELECT src_a, src_b,
        |  round(CAST(len(list_intersect(list_intersect(u, am), bm)) AS DOUBLE) / len(u), 6)
        |    AS jaccard_est
        |FROM p ORDER BY src_a, src_b""".stripMargin,
    // exact per-source quality quantiles via the lossless 6-dp bucket
    // histogram — the whole cumsum restated over bounded counts
    "sketch_quantiles" ->
      """WITH t AS (SELECT doc_id, source, length(text) n_chars,
        |  regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks,
        |  len(regexp_extract_all(text, '([^a-z0-9 ])', 1)) n_punct FROM documents),
        |u AS (SELECT doc_id, source, n_chars, n_punct, len(toks) n_tokens,
        |  len(list_filter(toks, tk -> list_contains(['the','and','of','to','a','in','is','you','that','it'], tk))) n_stop
        |  FROM t),
        |q AS (SELECT doc_id, source,
        |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
        |    + 0.3 * (1.0 - least(1.0, 10.0 * CAST(n_punct AS DOUBLE) / n_chars))
        |    + 0.3 * least(1.0, 5.0 * CAST(n_stop AS DOUBLE) / n_tokens), 6) quality FROM u),
        |b AS (SELECT source, CAST(round(quality*1e6, 0) AS BIGINT) qb FROM q
        |  WHERE quality IS NOT NULL),
        |h AS (SELECT source, qb, CAST(count(*) AS BIGINT) bn FROM b GROUP BY 1, 2),
        |c AS (SELECT source, qb, bn, sum(bn) OVER (PARTITION BY source ORDER BY qb) cum FROM h),
        |tt AS (SELECT source, CAST(sum(bn) AS BIGINT) n FROM h GROUP BY 1),
        |p AS (SELECT unnest([25, 50, 75, 90]) AS p_pct)
        |SELECT c.source, p.p_pct, round(min(c.qb) / 1e6, 6) AS q
        |FROM c JOIN tt ON c.source = tt.source CROSS JOIN p
        |WHERE c.cum >= ceil(p.p_pct * tt.n / 100.0)
        |GROUP BY c.source, p.p_pct
        |ORDER BY c.source, p.p_pct""".stripMargin,
    "sketch_algebra" ->
      """WITH tk AS (SELECT source, regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks
        |  FROM documents),
        |s AS (SELECT source, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)])
        |  END sh FROM tk),
        |g AS (SELECT source, unnest(sh) g0 FROM s),
        |h AS (SELECT DISTINCT source, CAST(md5_number_lower(g0) // 4 AS BIGINT) h FROM g),
        |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) rk FROM h),
        |mins AS (SELECT source, list(h ORDER BY h) mins FROM r WHERE rk <= 128 GROUP BY source),
        |p AS (SELECT a.source src_a, b.source src_b,
        |    list_sort(list_distinct(a.mins || b.mins))[1:128] u, a.mins am, b.mins bm
        |  FROM mins a JOIN mins b ON a.source < b.source),
        |e AS (SELECT src_a, src_b,
        |    CASE WHEN len(am) < 128 THEN CAST(len(am) AS DOUBLE)
        |      ELSE 127.0 * 4611686018427387904.0 / CAST(am[128] AS DOUBLE) END ea,
        |    CASE WHEN len(bm) < 128 THEN CAST(len(bm) AS DOUBLE)
        |      ELSE 127.0 * 4611686018427387904.0 / CAST(bm[128] AS DOUBLE) END eb,
        |    CASE WHEN len(u) < 128 THEN CAST(len(u) AS DOUBLE)
        |      ELSE 127.0 * 4611686018427387904.0 / CAST(u[128] AS DOUBLE) END eu,
        |    CAST(len(list_intersect(list_intersect(u, am), bm)) AS DOUBLE) / len(u) j
        |  FROM p)
        |SELECT src_a, src_b,
        |  round(eu, 3) AS est_union,
        |  round(j * eu, 3) AS est_inter,
        |  round(greatest(0.0, ea - j * eu), 3) AS est_diff_ab,
        |  round(greatest(0.0, eb - j * eu), 3) AS est_diff_ba
        |FROM e ORDER BY src_a, src_b""".stripMargin,
    "text_pii" ->
      """WITH p AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail.example.com or call ' || CAST(doc_id % 900 + 100 AS VARCHAR) ||
        |    '-555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' from ' ||
        |    CAST(doc_id % 223 + 1 AS VARCHAR) || '.' || CAST(doc_id % 256 AS VARCHAR) ||
        |    '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||
        |    CAST(doc_id % 100 + 1 AS VARCHAR) AS pii_text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pii_text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) n_emails,
        |  CAST(len(regexp_extract_all(pii_text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT)
        |    n_phones,
        |  CAST(len(regexp_extract_all(pii_text,
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) n_ipv4,
        |  md5(regexp_replace(regexp_replace(regexp_replace(pii_text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS red_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    "dedup_spans" ->
      """WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text),'([a-z0-9]+)',1) ts FROM documents),
        |nz AS (SELECT doc_id, ts FROM tk WHERE len(ts) > 0),
        |sl AS (SELECT doc_id,
        |    [{'no': CAST((s-1)//8 AS BIGINT), 'seg': array_to_string(ts[s:s+7], ' ')}
        |      for s in range(1, len(ts)+1, 8)] AS sgs FROM nz),
        |un AS (SELECT doc_id, unnest(sgs) AS sg FROM sl),
        |segs AS (SELECT doc_id, sg.no AS seg_no, sg.seg AS seg FROM un),
        |firsts AS (SELECT CAST(md5_number_lower(seg) // 4 AS BIGINT) gh,
        |    min({'d': doc_id, 's': seg_no}) AS first_key
        |  FROM segs GROUP BY 1),
        |rep AS (SELECT doc_id, count(*) AS n_segs,
        |    CAST(sum(CASE WHEN {'d': doc_id, 's': seg_no} = first_key
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |  FROM segs JOIN firsts ON CAST(md5_number_lower(seg) // 4 AS BIGINT) = gh
        |  GROUP BY doc_id)
        |SELECT doc_id, n_segs, n_kept,
        |  round(CAST(n_kept AS DOUBLE) / n_segs, 6) AS kept_ratio
        |FROM rep ORDER BY doc_id""".stripMargin,
    // flagship composition — the quality/langid/ngram CTEs are the
    // verified oracles of those queries, chained.
    "pipeline_split" ->
      """WITH t AS (SELECT doc_id, length(text) n_chars,
        |  regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks,
        |  len(regexp_extract_all(text, '([^a-z0-9 ])', 1)) n_punct FROM documents),
        |u AS (SELECT doc_id, n_chars, n_punct, len(toks) n_tokens,
        |  len(list_filter(toks, tk -> list_contains(['the','and','of','to','a','in','is','you','that','it'], tk))) n_stop
        |  FROM t),
        |q AS (SELECT doc_id,
        |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
        |    + 0.3 * (1.0 - least(1.0, 10.0 * CAST(n_punct AS DOUBLE) / n_chars))
        |    + 0.3 * least(1.0, 5.0 * CAST(n_stop AS DOUBLE) / n_tokens), 6) quality FROM u),
        |sp AS (SELECT doc_id, quality,
        |    CAST(md5_number_lower('split|' || CAST(doc_id AS VARCHAR)) // 4 AS BIGINT) % 1000
        |      AS slot FROM q),
        |lab AS (SELECT CASE WHEN slot < 900 THEN 'train' WHEN slot < 950 THEN 'val'
        |    ELSE 'test' END AS split, quality FROM sp)
        |SELECT split, count(*) AS n_docs,
        |  round(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        |    AS mean_quality
        |FROM lab GROUP BY split ORDER BY split""".stripMargin,
    "pipeline_token_budget" ->
      """WITH t AS (SELECT doc_id, length(text) n_chars,
        |  regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks,
        |  len(regexp_extract_all(text, '([^a-z0-9 ])', 1)) n_punct FROM documents),
        |u AS (SELECT doc_id, n_chars, n_punct, len(toks) n_tokens,
        |  len(list_filter(toks, tk -> list_contains(['the','and','of','to','a','in','is','you','that','it'], tk))) n_stop
        |  FROM t),
        |q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
        |    + 0.3 * (1.0 - least(1.0, 10.0 * CAST(n_punct AS DOUBLE) / n_chars))
        |    + 0.3 * least(1.0, 5.0 * CAST(n_stop AS DOUBLE) / n_tokens), 6) quality FROM u),
        |c AS (SELECT doc_id, quality, n_tokens,
        |  sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM q WHERE quality IS NOT NULL)
        |SELECT doc_id, quality, n_tokens FROM c WHERE cum <= 25000
        |ORDER BY doc_id""".stripMargin,
    "pipeline_domain_cap" ->
      """WITH t AS (SELECT doc_id, source, length(text) n_chars,
        |  regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks,
        |  len(regexp_extract_all(text, '([^a-z0-9 ])', 1)) n_punct FROM documents),
        |u AS (SELECT doc_id, source, n_chars, n_punct, len(toks) n_tokens,
        |  len(list_filter(toks, tk -> list_contains(['the','and','of','to','a','in','is','you','that','it'], tk))) n_stop
        |  FROM t),
        |q AS (SELECT doc_id, source,
        |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
        |    + 0.3 * (1.0 - least(1.0, 10.0 * CAST(n_punct AS DOUBLE) / n_chars))
        |    + 0.3 * least(1.0, 5.0 * CAST(n_stop AS DOUBLE) / n_tokens), 6) quality FROM u),
        |r AS (SELECT doc_id, source, quality,
        |  row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) rk
        |  FROM q WHERE quality IS NOT NULL)
        |SELECT doc_id, source, quality FROM r WHERE rk <= 20
        |ORDER BY doc_id""".stripMargin,
    "pipeline_curate" ->
      """WITH t AS (SELECT doc_id, length(text) n_chars,
        |  regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks,
        |  len(regexp_extract_all(text, '([^a-z0-9 ])', 1)) n_punct FROM documents),
        |u AS (SELECT doc_id, n_chars, n_punct, len(toks) n_tokens,
        |  len(list_filter(toks, tk -> list_contains(['the','and','of','to','a','in','is','you','that','it'], tk))) n_stop
        |  FROM t),
        |q AS (SELECT doc_id,
        |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
        |    + 0.3 * (1.0 - least(1.0, 10.0 * CAST(n_punct AS DOUBLE) / n_chars))
        |    + 0.3 * least(1.0, 5.0 * CAST(n_stop AS DOUBLE) / n_tokens), 6) quality FROM u),
        |dtk AS (SELECT doc_id, list_distinct(toks) dt FROM t),
        |l AS (SELECT doc_id,
        |  len(list_intersect(dt, ['the','and','of','to','a','in','is','you','that','it'])) s_en,
        |  len(list_intersect(dt, ['el','la','de','que','y','en','un','los','se','no'])) s_es,
        |  len(list_intersect(dt, ['le','la','de','et','les','des','en','un','du','une'])) s_fr,
        |  len(list_intersect(dt, ['der','die','und','in','den','von','zu','das','mit','sich'])) s_de
        |  FROM dtk),
        |lang AS (SELECT doc_id,
        |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
        |       WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
        |       WHEN s_de > 0 THEN 'de' ELSE 'und' END AS pred_lang FROM l),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM t),
        |ss AS (SELECT doc_id, sh, len(sh) n_sh FROM s WHERE len(sh) > 0),
        |p AS (SELECT doc_id, unnest(sh) g0 FROM ss),
        |ph AS (SELECT doc_id, CAST(md5_number_lower(g0) // 4 AS BIGINT) g FROM p),
        |c AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) common
        |  FROM ph a JOIN ph b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b,
        |  round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) jaccard
        |  FROM c JOIN ss sa ON c.doc_a = sa.doc_id JOIN ss sb ON c.doc_b = sb.doc_id),
        |dup AS (SELECT DISTINCT doc_b AS doc_id FROM j WHERE jaccard >= 0.5)
        |SELECT q.doc_id, q.quality, lang.pred_lang
        |FROM q JOIN lang ON q.doc_id = lang.doc_id
        |WHERE q.quality >= 0.5 AND lang.pred_lang = 'en'
        |  AND q.doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY q.doc_id""".stripMargin,
    // cluster-accurate curate: same gate CTEs, components closure for
    // the drop (keep min gated doc per connected near-dup component)
    "pipeline_curate_cc" ->
      """WITH RECURSIVE t AS (SELECT doc_id, length(text) n_chars,
        |  regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks,
        |  len(regexp_extract_all(text, '([^a-z0-9 ])', 1)) n_punct FROM documents),
        |u AS (SELECT doc_id, n_chars, n_punct, len(toks) n_tokens,
        |  len(list_filter(toks, tk -> list_contains(['the','and','of','to','a','in','is','you','that','it'], tk))) n_stop
        |  FROM t),
        |q AS (SELECT doc_id,
        |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
        |    + 0.3 * (1.0 - least(1.0, 10.0 * CAST(n_punct AS DOUBLE) / n_chars))
        |    + 0.3 * least(1.0, 5.0 * CAST(n_stop AS DOUBLE) / n_tokens), 6) quality FROM u),
        |dtk AS (SELECT doc_id, list_distinct(toks) dt FROM t),
        |l AS (SELECT doc_id,
        |  len(list_intersect(dt, ['the','and','of','to','a','in','is','you','that','it'])) s_en,
        |  len(list_intersect(dt, ['el','la','de','que','y','en','un','los','se','no'])) s_es,
        |  len(list_intersect(dt, ['le','la','de','et','les','des','en','un','du','une'])) s_fr,
        |  len(list_intersect(dt, ['der','die','und','in','den','von','zu','das','mit','sich'])) s_de
        |  FROM dtk),
        |lang AS (SELECT doc_id,
        |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
        |       WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
        |       WHEN s_de > 0 THEN 'de' ELSE 'und' END AS pred_lang FROM l),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM t),
        |ss AS (SELECT doc_id, sh, len(sh) n_sh FROM s WHERE len(sh) > 0),
        |p AS (SELECT doc_id, unnest(sh) g0 FROM ss),
        |ph AS (SELECT doc_id, CAST(md5_number_lower(g0) // 4 AS BIGINT) g FROM p),
        |c AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) common
        |  FROM ph a JOIN ph b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b,
        |  round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) jaccard
        |  FROM c JOIN ss sa ON c.doc_a = sa.doc_id JOIN ss sb ON c.doc_b = sb.doc_id),
        |e AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |ee AS (SELECT doc_a v, doc_b u FROM e UNION SELECT doc_b, doc_a FROM e),
        |reach(v, r) AS (
        |  SELECT v, v FROM (SELECT DISTINCT v FROM ee)
        |  UNION
        |  SELECT ee.v, reach.r FROM ee JOIN reach ON ee.u = reach.v),
        |comp AS (SELECT v doc_id, min(r) rep_id FROM reach GROUP BY v),
        |gated AS (SELECT q.doc_id, q.quality, lang.pred_lang
        |  FROM q JOIN lang ON q.doc_id = lang.doc_id
        |  WHERE q.quality >= 0.5 AND lang.pred_lang = 'en'),
        |gc AS (SELECT gated.doc_id, gated.quality, gated.pred_lang,
        |  coalesce(comp.rep_id, gated.doc_id) clid
        |  FROM gated LEFT JOIN comp ON gated.doc_id = comp.doc_id),
        |keep AS (SELECT clid, min(doc_id) doc_id FROM gc GROUP BY clid)
        |SELECT gc.doc_id, gc.quality, gc.pred_lang
        |FROM gc JOIN keep ON gc.clid = keep.clid AND gc.doc_id = keep.doc_id
        |ORDER BY gc.doc_id""".stripMargin,
    "pipeline_train_mix" ->
      """WITH t AS (SELECT doc_id, length(text) n_chars,
        |  regexp_extract_all(lower(text),'([a-z0-9]+)',1) toks,
        |  len(regexp_extract_all(text, '([^a-z0-9 ])', 1)) n_punct FROM documents),
        |u AS (SELECT doc_id, n_chars, n_punct, len(toks) n_tokens,
        |  len(list_filter(toks, tk -> list_contains(['the','and','of','to','a','in','is','you','that','it'], tk))) n_stop
        |  FROM t),
        |q AS (SELECT doc_id,
        |  round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
        |    + 0.3 * (1.0 - least(1.0, 10.0 * CAST(n_punct AS DOUBLE) / n_chars))
        |    + 0.3 * least(1.0, 5.0 * CAST(n_stop AS DOUBLE) / n_tokens), 6) quality FROM u),
        |dtk AS (SELECT doc_id, list_distinct(toks) dt FROM t),
        |l AS (SELECT doc_id,
        |  len(list_intersect(dt, ['the','and','of','to','a','in','is','you','that','it'])) s_en,
        |  len(list_intersect(dt, ['el','la','de','que','y','en','un','los','se','no'])) s_es,
        |  len(list_intersect(dt, ['le','la','de','et','les','des','en','un','du','une'])) s_fr,
        |  len(list_intersect(dt, ['der','die','und','in','den','von','zu','das','mit','sich'])) s_de
        |  FROM dtk),
        |lang AS (SELECT doc_id,
        |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
        |       WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
        |       WHEN s_de > 0 THEN 'de' ELSE 'und' END AS pred_lang FROM l),
        |s AS (SELECT doc_id, CASE WHEN len(toks)<3 THEN []
        |  ELSE list_distinct([array_to_string(toks[i:i+2],' ') for i in range(1,len(toks)-1)]) END sh FROM t),
        |ss AS (SELECT doc_id, sh, len(sh) n_sh FROM s WHERE len(sh) > 0),
        |p AS (SELECT doc_id, unnest(sh) g0 FROM ss),
        |ph AS (SELECT doc_id, CAST(md5_number_lower(g0) // 4 AS BIGINT) g FROM p),
        |c AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) common
        |  FROM ph a JOIN ph b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT doc_a, doc_b,
        |  round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) jaccard
        |  FROM c JOIN ss sa ON c.doc_a = sa.doc_id JOIN ss sb ON c.doc_b = sb.doc_id),
        |dup AS (SELECT DISTINCT doc_b AS doc_id FROM j WHERE jaccard >= 0.5),
        |kept AS (SELECT q.doc_id
        |  FROM q JOIN lang ON q.doc_id = lang.doc_id
        |  WHERE q.quality >= 0.5 AND lang.pred_lang = 'en'
        |    AND q.doc_id NOT IN (SELECT doc_id FROM dup)),
        |samp AS (SELECT doc_id FROM kept
        |  WHERE CAST(md5_number_lower('sample|' || doc_id::VARCHAR) // 4 AS BIGINT) % 1000 < 250),
        |tok AS (SELECT t.doc_id, len(t.toks) n_tok,
        |  CAST(floor(t.doc_id / 1000.0) AS BIGINT) blk
        |  FROM t JOIN samp ON t.doc_id = samp.doc_id),
        |cumt AS (SELECT doc_id, n_tok, blk,
        |  sum(n_tok) OVER (PARTITION BY blk ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM tok)
        |SELECT blk, CAST(floor((cum - n_tok) / 4096.0) AS BIGINT) AS win,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens
        |FROM cumt GROUP BY blk, win
        |ORDER BY blk, win""".stripMargin,
    // above-gate equality MoR delete: the oracle restates the delete
    // as an anti-predicate; lazy_eq = 1.0 pins that every tombstone
    // stayed on disk (per-executor key-set materialization)
    "q_spj_lazy_eq" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(1.0 AS DOUBLE) AS lazy_eq
        |FROM orders WHERE o_orderkey % 7 <> 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // group-vanish mview maintenance: the oracle restates the dim
    // relabel; incremental_vanish = 1.0 pins that the refresh stayed
    // subtractive (negative batch id) AND the emptied group vanished
    "mview_vanish" ->
      """WITH dim AS (SELECT c_custkey,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 'PROMO'
        |    ELSE c_mktsegment END AS c_mktsegment FROM customer)
        |SELECT c_mktsegment, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(1.0 AS DOUBLE) AS incremental_vanish
        |FROM orders JOIN dim ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // fact MoR delete applied subtractively: the oracle restates the
    // delete as an anti-predicate; incremental = 1.0 pins that the
    // refresh stayed on the CDC path (no fact re-aggregation), with
    // min/max riding extremum survivorship
    "mview_fact_mor" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi,
        |  CAST(1.0 AS DOUBLE) AS incremental
        |FROM orders WHERE o_orderkey % 5 <> 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // grouped pushdown beyond identity: the oracle restates the three
    // write-clustered commits (per-status + an all-null slice) as a
    // union; meta_only = 1.0 pins that the engine answered GROUP BY
    // (status, gen) from the ledgers with zero data opens
    "q_spj_group_stats" ->
      """WITH t AS (
        |  SELECT o_orderstatus, CAST(1 AS BIGINT) AS gen, o_orderkey
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderstatus, CAST(2 AS BIGINT), o_orderkey
        |  FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT CAST(NULL AS VARCHAR), CAST(3 AS BIGINT), o_orderkey
        |  FROM orders WHERE o_orderkey % 10 = 0
        |)
        |SELECT o_orderstatus, gen, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(o_orderkey) AS BIGINT) AS k_lo,
        |  CAST(max(o_orderkey) AS BIGINT) AS k_hi,
        |  CAST(sum(o_orderkey) AS BIGINT) AS s_key,
        |  CAST(CAST(sum(o_orderkey) AS BIGINT) AS DOUBLE)
        |    / CAST(count(o_orderkey) AS DOUBLE) AS a_key,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS d_status,
        |  CAST(1.0 AS DOUBLE) AS meta_only
        |FROM t GROUP BY o_orderstatus, gen ORDER BY gen""".stripMargin,
    // claimed identity filter + grouped readout: the oracle restates
    // the filtered rollup; meta_only / no_filter pin that the engine
    // answered from the kept dirs' ledgers with the conjunct gone
    "q_spj_filter_claim" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sk,
        |  CAST(CAST(sum(o_orderkey) AS BIGINT) AS DOUBLE)
        |    / CAST(count(o_orderkey) AS DOUBLE) AS ak,
        |  CAST(1.0 AS DOUBLE) AS meta_only, CAST(1.0 AS DOUBLE) AS no_filter
        |FROM orders WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // claimed days(date) window: the oracle restates the windowed
    // rollup; meta_only / no_filter pin the ledger-only, filter-free
    // plan over the window's day dirs
    "q_spj_time_claim" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sk,
        |  CAST(min(o_orderkey) AS BIGINT) AS k_lo,
        |  CAST(max(o_orderkey) AS BIGINT) AS k_hi,
        |  CAST(1.0 AS DOUBLE) AS meta_only, CAST(1.0 AS DOUBLE) AS no_filter
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-15'
        |  AND DATE '1995-02-14'""".stripMargin,
  )
}
