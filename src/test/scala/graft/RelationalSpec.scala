package graft

import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary: one row per (returnflag, linestatus)") {
    val rows = Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
    assert(rows.forall(r => r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price")))
  }

  test("q1 plan pushes the shipdate filter into the parquet scan") {
    val formatted = Relational.q1PricingSummary(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters") && formatted.contains("l_shipdate"))
    // column pruning: the scan must not read unneeded columns
    assert(!formatted.contains("l_suppkey"))
  }

  test("topk orders is price-descending and capped") {
    val rows = Relational.qTopkOrders(spark, sf).collect()
    assert(rows.length === 15)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("window rank keeps at most 3 orders per customer") {
    val df = Relational.qWindowRank(spark, sf)
    val maxPerCust = df.groupBy("o_custkey").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxPerCust <= 3)
  }

  test("semi and anti joins partition the customer set") {
    val semi = Relational.qSemiJoin(spark, sf).count()
    val anti = Relational.qAntiJoin(spark, sf).count()
    val all = Tables.customer(spark, sf).count()
    assert(semi + anti === all)
  }

  test("q5 plan broadcasts dimensions") {
    val plan = Relational.q5LocalSupplier(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("sessionize: session bounds ordered, events conserved") {
    val sess = Relational.qEventsSessionize(spark, sf).cache()
    val nEvents = sess.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(nEvents === Tables.events(spark, sf).count())
    import org.apache.spark.sql.functions.col
    assert(sess.filter(col("session_end") < col("session_start")).count() === 0)
    sess.unpersist()
  }

  test("approx_count_distinct tracks exact distinct counts within its error bound") {
    import org.apache.spark.sql.functions._
    val both = Tables.orders(spark, sf).agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), rsd = 0.05).as("approx")).head()
    val (exact, approx) = (both.getLong(0), both.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact drifted past 3x the 5% target rsd")
  }

  test("AsofJoin: left rows with no prior right row get null") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L)).toDF("k", "t", "id")
      .select(col("k"), expr("timestamp_millis(t)").as("ts"), col("id"))
    val right = Seq((1L, 150L, 20L, 7.5)).toDF("k", "t", "id", "v")
      .select(col("k"), expr("timestamp_millis(t)").as("ts"), col("id"), col("v"))
    val out = graft.operators.AsofJoin.join(left, right, Seq("k"), "ts", "id", "v")
      .orderBy("id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("asof_v")), "first left row precedes all right rows")
    assert(out(1).getDouble(out(1).fieldIndex("asof_v")) === 7.5)
  }

  test("generic AsofJoin operator reproduces the window-composed asof query") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
    val generic = graft.operators.AsofJoin.join(
      left = ev.where(col("event_type") === "purchase"),
      right = ev.where(col("event_type") === "click"),
      keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id", valueCol = "ts")
      .select(col("event_id"), col("asof_ts").as("last_click_ts"))
    val want = Relational.qAsofJoin(spark, sf)
      .select(col("event_id"), col("last_click_ts"))
    assert(generic.exceptAll(want).count() === 0)
    assert(want.exceptAll(generic).count() === 0)
  }

  test("asof join: last click precedes the purchase") {
    import org.apache.spark.sql.functions.col
    val df = Relational.qAsofJoin(spark, sf)
    assert(df.filter(col("last_click_ts") > col("ts")).count() === 0)
  }

  test("retention cohorts: week-0 cell is the cohort size and no cell exceeds it") {
    val m = Relational.qEventsRetention(spark, sf).collect()
    assert(m.nonEmpty)
    m.groupBy(_.getTimestamp(0)).foreach { case (cohort, rows) =>
      // every cohort member is active in its own first week, so the
      // week-0 cell IS the cohort size and later cells can only shrink
      val w0 = rows.find(_.getLong(1) == 0L).map(_.getLong(2))
      assert(w0.nonEmpty, s"cohort $cohort has no week-0 cell")
      rows.foreach { r =>
        assert(r.getLong(1) >= 0L, "negative weeks-since-cohort")
        assert(r.getLong(2) <= w0.get, s"cohort $cohort grows after week 0")
      }
    }
  }

  test("per-user anomalies: every flagged event really sits 2.5 sigma from its user's mean") {
    import org.apache.spark.sql.functions._
    val flagged = Relational.qEventsAnomaly(spark, sf).collect()
    assert(flagged.nonEmpty, "the fixture corpus should contain outliers")
    assert(flagged.forall(r => math.abs(r.getAs[Double]("zscore")) > 2.5))
    // cross-check one user against a literal driver-side computation
    val uid = flagged.head.getAs[Long]("user_id")
    val vals = graft.sources.Tables.events(spark, sf)
      .where(col("user_id") === uid).select("value").collect().map(_.getDouble(0))
    val mean = vals.sum / vals.length
    val std = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.length)
    val expect = vals.count(v => math.abs(v - mean) > 2.5 * std)
    assert(flagged.count(_.getAs[Long]("user_id") == uid) === expect,
      s"user $uid: flagged set must match the literal z-score definition")
  }
}
