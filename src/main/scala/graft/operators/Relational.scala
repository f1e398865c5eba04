package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** Relational query surface: the analytics a lakehouse user runs over
  * the catalog (reference: spark_jobs/query_iceberg.ipynb +
  * gold_reporting.py generalized to a full query core).
  *
  * Every query is a declarative DataFrame plan — Catalyst gets full
  * freedom for pushdown / pruning / join reordering, and AQE re-plans
  * at runtime. Dimension tables are explicitly broadcast; fact-fact
  * joins shuffle once on their join key. All money/quantity sums use
  * decimal-cast accumulation so results are partition-order independent
  * (see SURVEY.md §3).
  */
object Relational {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** TPC-H Q1-style pricing summary: single scan, map-side partial agg,
    * 6-group output. The filter reaches the parquet reader as a pushed
    * predicate; only 7 of 11 lineitem columns are read. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style: segment filter → 3-way join → revenue top-10.
    * customer is filtered before the join (pushdown), orders↔lineitem
    * shuffle on the order key; final top-k is TakeOrderedAndProject —
    * no global sort materialization. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1999-01-01 00:00:00")))
    val line = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > to_timestamp(lit("1999-01-01 00:00:00")))
    line
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: local-supplier revenue by nation. region/nation/
    * supplier broadcast; the two fact tables shuffle once each. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val line = Tables.lineitem(spark, dir)
    val supp = Tables.supplier(spark, dir)
    line
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust,
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Predicate + projection pushdown: the parquet scan must read only
    * (l_shipdate, l_returnflag, l_linestatus, l_quantity) with both
    * filters in PushedFilters. */
  def qFilterPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01 00:00:00")) &&
        col("l_returnflag") === "R")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy(col("l_linestatus"))

  /** Global top-k: sort+limit fuses to TakeOrderedAndProject — each
    * partition keeps k rows, driver merges k·p rows, never a full sort. */
  def qTopkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  /** Distinct + count-distinct per group (expand + two-phase agg). */
  def qDistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_orderpriority")).as("n_prio"),
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  /** Window rank: top-3 orders per customer. Single shuffle on the
    * partition key; rank ordering is fully tie-broken for determinism. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Left-semi join (EXISTS): customers having a finished order. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val fOrders = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    Tables.customer(spark, dir)
      .join(fOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no finished order. */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_nationkey"))
      .orderBy(col("c_custkey"))

  /** Rollup: (status, priority) hierarchy with subtotals + grand total. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** `q_grouping_sets` — ARBITRARY grouping-set combinations in one
    * pass (rollup/cube are the regular special cases; real reporting
    * wants e.g. (status, priority), (priority), () but NOT (status)):
    * one Expand + one keyed shuffle, same single-agg plan Spark gives
    * rollup. SQL-expressed — the Dataset API has rollup/cube only. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Pivot order status → columns (one wide agg, single shuffle). */
  def qPivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice")))
      .orderBy(col("o_orderpriority"))

  /** Scalar subquery: orders above the global average price. The
    * average is computed decimal-exact then broadcast as a literal. */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val avgExpr = (sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType) /
      count(lit(1))).as("global_avg")
    val above = orders.join(broadcast(orders.agg(avgExpr)))
      .filter(col("o_totalprice") > col("global_avg"))
    above
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_above"), dsum(col("o_totalprice")).as("sum_above"))
      .orderBy(col("o_orderstatus"))
  }

  /** As-of join: for each purchase event, the nearest prior click by
    * the same user. Composed as a union + running last-value window —
    * one shuffle on user_id, no range-explosion join. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val tagged = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"))
      .orderBy(col("event_id"))
  }

  /** Time-bucketed event aggregation — the batch twin of the streaming
    * tumbling-window plan (streaming/EventStream.scala). */
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      // unrounded: must stay value-identical to BOTH the DuckDB oracle
      // and the streaming twin (EventStream.hourlyAgg), neither of
      // which rounds — the decimal-cast sum is already deterministic
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Gap-based sessionization: session boundary when >30 min idle.
    * lag + running sum over one user_id shuffle — the batch twin of the
    * stateful streaming sessionizer. */
  def qEventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = 1800L
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** `q_events_anomaly` — per-user outlier detection (the telemetry
    * z-score screen: an event is anomalous when its value sits more
    * than 2.5 population standard deviations from ITS USER's mean).
    * Moment sums run over DECIMAL casts so both engines accumulate
    * EXACTLY (float addition is partition-order-dependent — §3);
    * mean/std then derive in doubles from those exact sums, so the
    * boundary compare is bit-identical cross-engine. Zero-variance
    * users are excluded (no scale to score against).
    *
    * Scale shape: one map-side-combinable moment aggregate (3 numbers
    * per user), the per-user stats relation is |users|-sized and
    * broadcasts back, the screen itself is a map-only filter — the
    * fact table shuffles once, for the agg. */
  /** Per-user (mean, population std) of `value` from decimal-exact
    * moment sums — the offline "model" the anomaly screen applies;
    * also consumed by the STREAMING screen
    * ([[graft.streaming.EventStream.anomalyScreen]]), which scores
    * live events against exactly these batch-trained stats. */
  def userValueStats(events: DataFrame): DataFrame = {
    val d = col("value").cast("decimal(18,6)")
    val meanD = col("s1").cast("double") / col("n")
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(d).as("s1"), sum(d * d).as("s2"))
      .select(col("user_id"), meanD.as("mean"),
        sqrt(greatest(col("s2").cast("double") / col("n") - meanD * meanD, lit(0.0)))
          .as("std"))
  }

  /** The screen itself: events whose value sits > `sigma` population
    * standard deviations from their user's mean. Works unchanged on a
    * batch OR streaming `events` relation (stream-static broadcast
    * join + map-only filter — stateless, so the streaming twin is the
    * SAME code). */
  def anomalyScreen(events: DataFrame, stats: DataFrame, sigma: Double = 2.5): DataFrame =
    events.join(broadcast(stats), Seq("user_id"))
      .where(col("std") > 0 && abs(col("value") - col("mean")) > lit(sigma) * col("std"))
      .select(col("event_id"), col("user_id"), col("value"),
        round((col("value") - col("mean")) / col("std"), 4).as("zscore"))

  def qEventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("value"))
    anomalyScreen(e, userValueStats(e)).orderBy("event_id")
  }

  /** Semi-structured prop extraction: JSON field → typed agg. */
  def qEventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** CUBE aggregation: all grouping-set combinations of
    * (status, priority) in one pass. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Ordered string aggregation: deterministic listagg via
    * collect_set → array_sort → join (no reliance on input order). */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("o_orderpriority")))).as("priorities"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** Set operations: customers ordering in both statuses (INTERSECT)
    * and high-value-only customers (EXCEPT), unioned with a tag. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val f = o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
    val open = o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
    f.intersect(open).withColumn("tag", lit("both"))
      .union(f.except(open).withColumn("tag", lit("f_only")))
      .orderBy(col("tag"), col("o_custkey"))
  }

  /** TPC-H Q7 shape: shipping volume between two nations by year —
    * double-sided dimension filter pushed through broadcast joins,
    * grouped on (supp_nation, cust_nation, year). */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q10 shape: top customers by returned-item revenue —
    * filtered fact join + group + global top-k. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q18 shape: large-quantity orders — aggregated HAVING
    * subquery feeding a semi-join back onto the fact tables. */
  def q18LargeOrders(spark: SparkSession, dir: String, minQty: Int = 150): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > minQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === big("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
  }

  /** Funnel analysis: users progressing view → click → purchase in
    * strict event-time order. Three keyed aggregations chained by
    * conditional minima — each stage is one shuffle on user_id, never
    * a per-user sequence scan on the driver. */
  def qEventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val tA = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val tB = ev.where(col("event_type") === "click").join(tA, "user_id")
      .where(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val tC = ev.where(col("event_type") === "purchase").join(tB, "user_id")
      .where(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    tA.join(tB.select("user_id", "t_click"), Seq("user_id"), "left")
      .join(tC.select("user_id", "t_purchase"), Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("t_click").isNotNull.as("reached_click"),
        col("t_purchase").isNotNull.as("reached_purchase"))
      .orderBy("user_id")
  }

  /** Running totals: cumulative revenue per customer in order-date
    * order — one shuffle on the partition key, a frame-bounded window
    * sum inside it. */
  def qRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.orders(spark, dir)
      .where(col("o_custkey") <= 200)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Exact median (and quartiles) without engine-specific percentile
    * functions: rank rows per group and average the middle one or two
    * — integer ranks make the result bit-identical across engines,
    * where native `percentile`/`quantile_cont` interpolation rules
    * differ. One shuffle per group key. */
  def qMedianPrice(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy(col("o_orderstatus"))).as("n"))
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division and the
      // odd-middle rank comparison would silently never match.
      .where(col("rn") === expr("(n + 1) div 2") || col("rn") === expr("n div 2 + 1"))
      .groupBy(col("o_orderstatus"))
      .agg(
        round(avg(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 6).as("median_price"),
        max(col("n")).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** Range join at scale: clicks within the 10 minutes before each
    * purchase, SAME user. The naive plan is an inequality join (per
    * user cartesian); this one buckets time into 10-minute blocks and
    * equi-joins on (user_id, bucket) with each purchase probing its
    * own and the previous bucket — shuffle is keyed, bounded, and
    * AQE-skew-splittable, which is the difference between O(n·k) and
    * O(n²/users) at 100 TB. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val winMicros = 600L * 1000000L
    val ev = Tables.events(spark, dir)
    // The two sides derive from the same scan; rename user_id on each so
    // the join condition is structurally unambiguous (no reliance on the
    // analyzer's trivially-true-self-join disambiguation heuristic).
    val clicks = ev.where(col("event_type") === "click")
      .select(
        col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"),
        floor(unix_micros(col("ts")) / winMicros).as("c_bucket"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"),
        floor(unix_micros(col("ts")) / winMicros).as("b0"))
      .select(col("p_user"), col("p_ts"), col("p_id"),
        explode(array(col("b0") - 1, col("b0"))).as("p_bucket"))
    purchases
      .join(clicks,
        col("p_user") === col("c_user")
          && col("p_bucket") === col("c_bucket")
          && col("c_ts") < col("p_ts")
          && col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"),
        "left")
      .groupBy(col("p_id").as("event_id"))
      .agg(count(col("c_id")).as("n_clicks_10m"))
      .orderBy(col("event_id"))
  }

  /** TPC-H Q14 shape: promo-type revenue share over one ship month.
    * `part` is a dimension — broadcast to the (month-filtered) fact
    * scan, so the only data movement is one month of lineitem through
    * a map-side hash join and a scalar aggregate; the shipdate range
    * reaches the parquet reader as a pushed predicate. */
  def q14PromoEffect(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= to_timestamp(lit("1998-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1998-02-01 00:00:00")))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0)
          * dsum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0)), 4)
          / dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4),
        6).as("promo_revenue"))

  /** TPC-H Q13 shape: distribution of orders-per-customer. Two
    * aggregations chained — count per customer over a LEFT join (so
    * zero-order customers keep count 0), then a histogram over those
    * counts. Both aggregate map-side first; neither shuffle carries
    * more than one row per customer. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q17 shape: revenue lost to small-quantity orders of
    * selected parts. The correlated scalar subquery (per-part average
    * quantity) becomes a pre-aggregated relation joined back on
    * partkey — one extra map-side-combined aggregation instead of a
    * per-row subquery execution; the part filter broadcasts.
    *
    * The `qty < 0.2·avg(qty)` threshold is restated as the exact
    * integer inequality `5·qty·cnt < sum(qty)` (quantities are
    * integral): engine-exact, where a decimal-vs-double average could
    * flip boundary rows between Spark and the oracle. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
    val stats = l.groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
    val smallParts = broadcast(Tables.part(spark, dir)
      .where(col("p_brand") === "Brand#2" && col("p_type") === "ECONOMY")
      .select("p_partkey"))
    l.join(smallParts, col("l_partkey") === col("p_partkey"))
      .join(stats, col("l_partkey") === col("a_partkey"))
      .where(lit(5L) * col("qty") * col("cnt") < col("sum_qty"))
      .agg(round(dsum(col("l_extendedprice"), 2) / 7.0, 6).as("avg_yearly"))
  }

  /** TPC-H Q19 shape: discounted revenue under OR'd (brand, size,
    * quantity) predicate triples. The disjunction can't prune the fact
    * scan, but the dimension side broadcasts and the whole filter is
    * one codegen'd predicate over the joined row — no shuffle at all
    * besides the final scalar agg. */
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 15)
          && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#4" && col("p_size").between(10, 30)
            && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#17" && col("p_size").between(20, 50)
            && col("l_quantity").between(20, 35)))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))

  // ---- the remaining TPC-H query shapes (2, 4, 6, 8, 9, 11, 12, 15,
  // 16, 20, 21, 22), adapted to the testdata's reduced schema: there
  // is no partsupp table (the part×supplier relation is DERIVED from
  // lineitem at group cardinality) and no commit/receipt dates (a
  // "late" lineitem ships > N days after its order date). Shapes —
  // correlated minima, EXISTS/NOT-EXISTS pairs, scalar thresholds,
  // distinct-count groupings — are preserved exactly.

  /** TPC-H Q2 shape: minimum-cost supplier per part in a region. The
    * partsupp analog is a lineitem rollup (min observed unit price per
    * (part, supplier) — group cardinality, map-side combined); the
    * correlated MIN subquery becomes a per-part aggregate joined back
    * on (partkey, cost) — two keyed shuffles, dims broadcast. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val euro = broadcast(
      Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, dir).where(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    val parts = broadcast(Tables.part(spark, dir)
      .where(col("p_size") === 15 && col("p_type") === "LARGE")
      .select("p_partkey", "p_name"))
    // Both dim joins key on the grouping columns, so they commute
    // with the rollup: semi-join the fact against the BROADCAST
    // filtered dims FIRST, so the (part, supplier) aggregation only
    // shuffles qualifying rows (~1% of the fact at TPC-H selectivity)
    // instead of the full group cardinality — the difference between
    // a map-side-combined trickle and a full-fact shuffle at 100 TB.
    val supply = Tables.lineitem(spark, dir)
      .join(parts.select("p_partkey"), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(euro.select("s_suppkey"), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("supply_cost"))
      .join(euro, col("l_suppkey") === col("s_suppkey"))
      .join(parts, col("l_partkey") === col("p_partkey"))
    // correlated MIN as a keyed window over the POST-AGG relation
    // (bounded by suppliers-per-part) — an agg + join-back would
    // recompute the whole fact scan on both sides (no subtree reuse
    // across self-joins, §4)
    val w = Window.partitionBy(col("l_partkey"))
    supply
      .withColumn("best_cost", min(col("supply_cost")).over(w))
      .where(col("supply_cost") === col("best_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_name"), col("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q4 shape: order-priority checking — quarter-filtered orders
    * EXISTS-semi-joined to their late lineitems (shipped > 90 days
    * after order date), counted per priority. One semi-join shuffle on
    * orderkey, map-side-combined count. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
        && col("o_orderdate") < to_timestamp(lit("1997-04-01 00:00:00")))
    val late = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    orders
      .join(late, col("l_orderkey") === col("o_orderkey")
        && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q6 shape: forecast revenue change — pure scan-filter-agg,
    * every predicate pushed to the parquet reader, no join, no
    * shuffle beyond the final scalar. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00"))
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))

  /** TPC-H Q8 shape: national market share — a target nation's share
    * of regional order volume per year, sum(CASE)/sum over the full
    * star join; dims broadcast, facts shuffle once on their keys. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nCust = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region")))
    val nSupp = broadcast(Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val america = broadcast(Tables.region(spark, dir).where(col("r_name") === "AMERICA"))
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).where(col("p_type") === "STANDARD")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(nCust, col("c_nationkey") === col("cn_key"))
      .join(america, col("cn_region") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(nSupp, col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        dsum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0)), 4)
          / dsum(vol, 4), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape: product-type profit by nation and year. The
    * ps_supplycost analog is p_retailprice: profit = revenue − cost ×
    * quantity, grouped by supplier nation and order year. Quantity is
    * integral — the cost product stays decimal-exact. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val redParts = broadcast(Tables.part(spark, dir)
      .where(col("p_name").like("%red%"))
      .select("p_partkey", "p_retailprice"))
    val amount = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, dir)
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(amount, 4).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape: important stock — per-part supplied value from
    * one nation's suppliers, kept only above a scalar fraction of the
    * nation's total. The scalar subquery is a 1-row broadcast joined
    * into the HAVING; both aggregations combine map-side. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).where(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey"))
    // the scalar total rides a global window over the POST-AGG per-part
    // relation (one row per part) — kept DECIMAL inside the window so
    // the sum is associative-exact, cast to double only at the compare.
    // A scalar-agg + broadcast join-back would scan the fact twice.
    val perPart = Tables.lineitem(spark, dir)
      .join(natSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("value_dec"))
    perPart
      .withColumn("total_dec", sum(col("value_dec")).over(Window.partitionBy()))
      .where(col("value_dec").cast(DoubleType)
        > col("total_dec").cast(DoubleType) * lit(0.001))
      .select(col("l_partkey"), col("value_dec").cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H Q12 shape: shipping-class priority counts — fact-fact join
    * on orderkey, CASE-sums by order priority class, grouped by the
    * lineitem's class column (return flag stands in for ship mode). */
  def q12ShippingClasses(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))

  /** TPC-H Q15 shape: top supplier — quarterly revenue per supplier,
    * suppliers at the scalar MAX kept. The revenue view aggregates
    * once; the max is a 1-row broadcast. Decimal-exact sums make the
    * max-equality cross-engine safe. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("total_revenue"))
    // scalar MAX via a global window over the one-row-per-supplier agg
    // (max is order-exact) — not an agg + join-back that would rescan
    // the quarter's lineitems twice
    revenue
      .withColumn("max_revenue", max(col("total_revenue")).over(Window.partitionBy()))
      .where(col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 shape: parts/supplier relationship — distinct supplier
    * count per (brand, type, size) over the derived part×supplier
    * relation, excluding flagged suppliers (negative balance stands in
    * for the complaints filter) via anti-join. */
  def q16PartsSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val flagged = broadcast(Tables.supplier(spark, dir)
      .where(col("s_acctbal") < 0).select("s_suppkey"))
    val rel = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
    rel
      .join(broadcast(Tables.part(spark, dir)
        .where(col("p_brand") =!= "Brand#4" && !col("p_type").like("MEDIUM%")
          && col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q20 shape: potential part promotion — suppliers of one
    * nation who supplied MORE THAN HALF of a selected part's 1997
    * volume. The availqty comparison becomes the exact integer
    * inequality 2·qty > total over the derived supply rollup; the
    * per-part total joins back at group cardinality. */
  def q20PartPromotion(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = broadcast(Tables.part(spark, dir)
      .where(col("p_name").like("small%")).select("p_partkey"))
    val supply = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    // per-part total as a keyed window over the post-agg supply rollup
    // (exact integer sum, bounded by suppliers-per-part) — one fact
    // scan instead of the join-back's two
    val dominant = supply
      .withColumn("total_qty",
        sum(col("qty")).over(Window.partitionBy(col("l_partkey"))))
      .where(lit(2L) * col("qty") > col("total_qty"))
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).where(col("n_name") === "NATION_5")),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** TPC-H Q21 shape: suppliers who kept orders waiting — the classic
    * EXISTS(other supplier) AND NOT EXISTS(other LATE supplier)
    * double-correlation, restated as one keyed aggregation per order
    * (distinct suppliers, distinct late suppliers) joined back to the
    * late lineitems: two shuffles on orderkey, no self-join recompute,
    * no per-order driver loop. Late = shipped > 60 days after order
    * date (the commit/receipt-date analog). */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val ordersF = Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ordersF, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val natSupp = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).where(col("n_name") === "NATION_1"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name"))
    // the EXISTS / NOT-EXISTS pair rides ONE keyed window over the
    // order's lineitems (distinct suppliers / distinct late suppliers
    // per order, bounded by lineitems-per-order) — an agg + join-back
    // would recompute the lineitem×orders join on both sides
    val w = Window.partitionBy(col("l_orderkey"))
    li
      .withColumn("nsupp", size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("nlate",
        size(collect_set(when(col("late"), col("l_suppkey"))).over(w)))
      .where(col("late") && col("nsupp") >= 2 && col("nlate") === 1)
      .select("l_orderkey", "l_suppkey").distinct()
      .join(natSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q22 shape: global sales opportunity — positive-balance
    * customers of selected nations above the segment's average
    * balance, with no RECENT orders (the canonical "no orders for 7
    * years", anti-joined against the date-filtered fact), counted per
    * nation code. The average is a decimal-exact scalar broadcast. */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val codes = Seq(1, 3, 5, 7, 9, 11, 13)
    val cust = Tables.customer(spark, dir)
      .where(col("c_nationkey").isin(codes: _*))
    val avgBal = cust.where(col("c_acctbal") > 0)
      .agg((dsum(col("c_acctbal"), 2) / count(lit(1))).as("avg_bal"))
    cust.join(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00")))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  /** `q_events_retention` — cohort retention matrix: users cohorted by
    * their first-activity week; for each (cohort, weeks-since-cohort)
    * cell, how many of that cohort's users were active. The standard
    * product-analytics readout of an event stream.
    *
    * Scale shape: one groupBy(user_id) for cohorts (map-side combined
    * min), one distinct over (user_id, week) — both keyed shuffles on
    * user_id that AQE coalesces into the SAME partitioning, so the
    * cohort join is co-partitioned, not a third shuffle; the final
    * cell rollup is a small keyed agg. No windows, no per-user state.
    * Week arithmetic uses SECOND-floored epoch diffs (both engines
    * truncate to Monday week starts in UTC, so diffs are exact
    * 604800-multiples). */
  /** `q_events_tophh` — per-segment HEAVY HITTERS: the top-5 users
    * by total event value within each event type (the "top
    * contributors per segment" readout every telemetry pipeline
    * serves). Two-level shape built for scale: the per-(type, user)
    * rollup is ONE map-side-combinable decimal-exact sum (§3 — float
    * sums are partition-order-dependent), and the per-segment top-5
    * rides the native bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]) over that |types|·|users|-bounded
    * relation — never a `row_number` window shipping a whole segment
    * to one reducer. Ranking happens on the DOUBLE cast of the exact
    * decimal (same value both engines), ties break to the lower
    * user id — the ordering the oracle's window restates. */
  def qEventsTophh(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("total"))
    per.groupBy("event_type")
      .agg(graft.functions.TopKAgg.topK(
        col("total").cast("double"), col("user_id").cast("long"), 5).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(
        col("event_type"), col("col.vec_id").as("user_id"),
        (col("pos") + 1).as("rnk"), round(col("col.cosine"), 6).as("total"))
      .orderBy("event_type", "rnk")
  }

  def qEventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val cohorts = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val active = ev.distinct()
    active.join(cohorts, "user_id")
      .groupBy(
        col("cohort_week"),
        floor((floor(unix_timestamp(col("week"))) - floor(unix_timestamp(col("cohort_week")))) / 604800L)
          .cast("long").as("week_no"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_no"))
  }
}
