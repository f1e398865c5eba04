package graft

import org.apache.spark.sql.functions._

import graft.operators.Medallion
import graft.sources.Tables

class MedallionSpec extends SparkSpec {

  test("catalog surface: SHOW TABLES lists the registered views") {
    graft.sources.Tables.registerAll(spark, sf)
    val tables = spark.sql("SHOW TABLES").collect().map(_.getAs[String]("tableName")).toSet
    assert(graft.sources.Tables.names.toSet.subsetOf(tables))
    assert(spark.sql("SELECT count(*) FROM region").head().getLong(0) === 5)
  }

  test("runPipeline: bronze → silver → gold land as lakehouse snapshots + csv export") {
    val root = java.nio.file.Files.createTempDirectory("graft-medallion").toString
    val gold = graft.operators.Medallion.runPipeline(spark, sf, root)
    assert(gold.count() > 0)
    val lake = new graft.sources.Lakehouse(spark, root)
    assert(lake.read("bronze_orders").count() === graft.sources.Tables.orders(spark, sf).count())
    assert(lake.read("silver_customers").count() === graft.sources.Tables.customer(spark, sf).count())
    assert(spark.sql("SELECT count(*) FROM gold_sales").head().getLong(0) === gold.count())
    assert(spark.read.option("header", "true").csv(s"$root/export/gold_sales_csv").count() === gold.count())
  }

  test("bronze document assembly preserves order and item counts") {
    val docs = Medallion.bronzeOrderDocs(spark, sf).cache()
    val nOrders = Tables.orders(spark, sf).count()
    val nLines = Tables.lineitem(spark, sf).count()
    assert(docs.count() === nOrders)
    val itemSum = docs.agg(sum(size(col("items")))).head().getLong(0)
    assert(itemSum === nLines)
    // document shape: items is an array of structs with the Mongo-doc fields
    val itemType = docs.schema("items").dataType.simpleString
    assert(itemType.contains("product_id") && itemType.contains("unit_price"))
    docs.unpersist()
  }

  test("silver struct rebuild adds the country literal") {
    val silver = Medallion.silverEnrich(spark, sf)
    val addr = silver.schema("shipping_address").dataType.simpleString
    assert(addr.contains("country"))
    val countries = silver.select(col("shipping_address.country")).distinct().collect()
    assert(countries.map(_.getString(0)).toSeq === Seq("INDIA"))
  }

  test("gold report is revenue-descending with positive aggregates") {
    val gold = Medallion.goldSalesReport(spark, sf).collect()
    assert(gold.nonEmpty)
    val revs = gold.map(_.getAs[Double]("total_revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
    assert(gold.forall(_.getAs[Long]("order_count") > 0))
  }

  test("gold report plan broadcasts the dimension joins") {
    val plan = Medallion.goldSalesReport(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
