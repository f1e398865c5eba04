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

  // Inferred parquet schemas keyed by (path, mtime, length): a bare
  // `spark.read.parquet` runs one schema-inference driver JOB per
  // call, and the driver surface re-opens the same immutable testdata
  // files 1-3 times per query (~0.02-0.04 s each, profiled) — seconds
  // across the 154-query bench for zero information. The stat-stamped
  // key means a regenerated testdata file (new mtime/length) can
  // never be served a stale schema; entries are a few KB each.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val stamp = scala.util.Try {
      val f = new java.io.File(path)
      (f.lastModified(), f.length())
    }.getOrElse((0L, 0L))
    val key = (path, stamp._1, stamp._2)
    val cached = schemaCache.get(key)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      if (schemaCache.size > 256) schemaCache.clear()
      schemaCache.put(key, df.schema)
      df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Schema-aware events reader. The driver has regenerated
    * `events.parquet` with different physical `ts` encodings across
    * rounds — TIMESTAMP(NANOS) (arrives as LongType under
    * `nanosAsLong`), plain TIMESTAMP_NTZ, or session TIMESTAMP — so
    * this branches on what the footer actually declares instead of
    * hard-coding one historical encoding. All branches normalize to
    * session-zone TimestampType (the session is UTC, so NTZ→TZ is
    * value-identical and keeps the DuckDB oracle's schema/hash match).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw nanos: floor to micros (same truncation DuckDB applies)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
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
    if (scanWidth(spark, df) < target) df.repartition(target) else df
  }

  /** Estimated scan partition count WITHOUT converting the plan to an
    * RDD (`df.rdd` forces full physical planning plus a deserializer
    * layer just to read a number). The callers all pass single
    * parquet scans, so the file relation's byte size against
    * `maxPartitionBytes` is the split count Spark itself would
    * produce (modulo per-file rounding — irrelevant to the "is this
    * narrow?" test). A plan with no file relation (never the case
    * today) conservatively reports wide, making `parallel` a no-op
    * rather than forcing a shuffle. */
  private def scanWidth(spark: SparkSession, df: DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.analyzed.collectFirst {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        val bytes = l.relation.asInstanceOf[HadoopFsRelation].location.sizeInBytes
        val maxSplit = scala.util.Try(
          org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes"))).getOrElse(128L << 20)
        (bytes / math.max(maxSplit, 1L)) + 1L
    }.getOrElse(Long.MaxValue)
  }

  /** Register every table as a temp view so `spark.sql` works against
    * the scale-factor directory like a catalog namespace.
    *
    * Per-table fault isolation: one unreadable/re-encoded table must
    * not take down SQL queries that never touch it (a grouping-sets
    * query over `orders` has no business failing because `events`
    * changed encoding). Failures are reported loudly on stderr and the
    * remaining tables still register; the failed table surfaces its
    * real error only when a query actually references it. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      try {
        val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
        df.createOrReplaceTempView(n)
      } catch {
        case e: Exception =>
          System.err.println(s"[graft] registerAll: table '$n' failed to register from $dir: ${e.getMessage}")
      }
    }
}
