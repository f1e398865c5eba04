package graft

import org.apache.spark.sql.SparkSession

/** Tuned local SparkSession factory.
  *
  * Mirrors the session-bootstrap role of the reference's `create_spark()`
  * (reference: spark_jobs/mongo_to_iceberg.py:70, gold_reporting.py:63) —
  * but configured for Spark-native execution at scale rather than a
  * jar-wired connector stack: AQE on (runtime coalesce + skew-join),
  * shuffle partitions sized to the local core count (raise on a real
  * cluster), UTC session time zone for cross-engine determinism.
  */
object GraftSession {
  def builder(cores: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.shuffle.spill.compress", "true")

  def local(cores: Int = 32): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
