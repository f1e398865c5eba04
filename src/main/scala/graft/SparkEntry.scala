package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Medallion, Relational}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7
  * (build plan). Each `queries` entry has a DuckDB `oracleSql` twin
  * following the cross-engine determinism rules in SURVEY.md §3.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Medallion.goldSalesReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A — reference surface (medallion)
    "bronze_orders_nested" -> (Medallion.bronzeVerification _),
    "silver_enrich" -> (Medallion.silverVerification _),
    "gold_sales_report" -> (Medallion.goldSalesReport _),
    "sql_catalog_query" -> (Medallion.sqlCatalogQuery _),
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
    "q_events_sessionize" -> (Relational.qEventsSessionize _),
    "q_events_json" -> (Relational.qEventsJson _),
  )

  /** DuckDB-runnable ANSI SQL twins (same table names, same aliases,
    * same deterministic arithmetic — SURVEY.md §3). */
  def oracleSql: Map[String, String] = Map(
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
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,
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
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS sum_k,
        |  max(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
  )
}
