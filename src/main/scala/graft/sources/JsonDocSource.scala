package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-explicit reader for nested order documents — the
  * Mongo-document shape the reference ingests (reference:
  * airflow/dags/json_to_mongo_dag.py order docs;
  * spark_jobs/mongo_to_iceberg.py bronze read).
  *
  * The schema is DECLARED, not inferred: at 100 TB, schema inference
  * is a full extra pass over the data and silently widens types on
  * dirty rows. Explicit schema + `columnNameOfCorruptRecord` gives a
  * single-pass read with quarantined bad records.
  */
object JsonDocSource {

  val itemSchema: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("product_name", StringType),
    StructField("quantity", IntegerType),
    StructField("unit_price", DoubleType)))

  val addressSchema: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("zip", StringType)))

  val orderDocSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("order_date", StringType),
    StructField("status", StringType),
    StructField("items", ArrayType(itemSchema)),
    StructField("total_amount", DoubleType),
    StructField("shipping_address", addressSchema),
    StructField("_corrupt", StringType)))

  /** Read newline-delimited order docs (the scalable layout: line-
    * split JSON parallelizes per-line; multiLine JSON cannot split). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(orderDocSchema)
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Valid documents only. */
  def readValid(spark: SparkSession, path: String): DataFrame =
    read(spark, path).where(col("_corrupt").isNull && col("order_id").isNotNull)
      .drop("_corrupt")

  /** Quarantined raw lines that failed the schema. (Cached first:
    * Spark refuses corrupt-column-only queries on a raw file scan.) */
  def readCorrupt(spark: SparkSession, path: String): DataFrame =
    read(spark, path).cache().where(col("_corrupt").isNotNull).select("_corrupt")

  /** One row per line item, order fields carried — the bronze
    * flattening used downstream (silver/gold). */
  def flattenItems(docs: DataFrame): DataFrame =
    docs.select(
      col("order_id"), col("customer_id"), col("order_date"), col("status"),
      col("total_amount"), col("shipping_address"),
      posexplode_outer(col("items")).as(Seq("item_no", "item")))
      .select(
        col("order_id"), col("customer_id"), col("order_date"), col("status"),
        col("total_amount"), col("shipping_address"), col("item_no"),
        col("item.product_id").as("product_id"),
        col("item.product_name").as("product_name"),
        col("item.quantity").as("quantity"),
        col("item.unit_price").as("unit_price"))

  /** Recompute the document total from items and flag mismatches —
    * the bronze row-fidelity check. */
  def totalsCheck(docs: DataFrame): DataFrame =
    docs.select(
      col("order_id"), col("total_amount"),
      round(aggregate(col("items"), lit(0.0),
        (acc, it) => acc + it("quantity").cast("double") * it("unit_price")), 2)
        .as("items_total"))
      .withColumn("total_matches",
        abs(col("total_amount") - col("items_total")) < 0.005)
}
