package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry over the driver-generated testdata parquet tables.
  *
  * Plays the catalog role of the reference's Nessie/Iceberg catalog
  * (reference: spark_jobs/query_iceberg.ipynb — `SHOW TABLES IN
  * nessie.sales`, `SELECT * FROM nessie.sales.mongo_orders`): every
  * table is reachable both through the typed accessors and through
  * `spark.sql` after [[registerAll]].
  *
  * Scans stay declarative (`spark.read.parquet`) so Catalyst pushes
  * filters and prunes columns at the source — at 100 TB the scan cost
  * is dominated by what reaches the parquet reader, not by anything
  * downstream.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw nanos and floor to microseconds —
    * the same truncation DuckDB applies on read, keeping the two
    * engines value-identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Ensure a scan has at least the session's default parallelism.
    *
    * Parquet can't split inside a row group, so a small file arrives
    * as ONE partition and any per-row-CPU-heavy pipeline (shingling,
    * hashing, vector math) runs on one core. When the scan is already
    * wide (the 100 TB case: thousands of splits) this is a no-op —
    * no extra shuffle; when it's narrow, one cheap round-robin
    * repartition unlocks every core. */
  def parallel(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Register every table as a temp view so `spark.sql` works against
    * the scale-factor directory like a catalog namespace. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => load(spark, dir, n).createOrReplaceTempView(n)
    }
}
