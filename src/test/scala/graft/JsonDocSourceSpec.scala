package graft

import org.apache.spark.sql.functions._

import graft.sources.JsonDocSource

class JsonDocSourceSpec extends SparkSpec {

  private val fixture = getClass.getResource("/orders_fixture.jsonl").getPath

  test("schema-explicit read parses valid docs and quarantines bad lines") {
    assert(JsonDocSource.readValid(spark, fixture).count() === 4)
    assert(JsonDocSource.readCorrupt(spark, fixture).count() === 1)
  }

  test("nested structure survives: items array and address struct") {
    val doc = JsonDocSource.readValid(spark, fixture)
      .where(col("order_id") === "ORD-1001").head()
    assert(doc.getAs[Seq[_]]("items").length === 2)
    assert(doc.getAs[org.apache.spark.sql.Row]("shipping_address").getAs[String]("city") === "Hyderabad")
  }

  test("flattenItems: one row per item, empty items preserved via outer explode") {
    val flat = JsonDocSource.flattenItems(JsonDocSource.readValid(spark, fixture))
    assert(flat.count() === 5) // 2 items + 1 + 1 empty(null item) + 1
    assert(flat.where(col("order_id") === "ORD-1003").count() === 1)
    assert(flat.where(col("order_id") === "ORD-1003").head().isNullAt(
      flat.columns.indexOf("product_id")))
  }

  test("totalsCheck flags consistent and inconsistent totals") {
    val checks = JsonDocSource.totalsCheck(JsonDocSource.readValid(spark, fixture))
      .collect().map(r => r.getAs[String]("order_id") -> r.getAs[Boolean]("total_matches")).toMap
    assert(checks("ORD-1001"))
    assert(checks("ORD-1002"))
    assert(checks("ORD-1004"))
  }
}
