package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Lakehouse
import graft.sources.spj.GraftSpjCatalog

/** DSv2 micro-batch streaming of catalog tables —
  * `spark.readStream.table("cat.t")`
  * ([[graft.sources.spj.GraftSpjMicroBatchStream]]): snapshot-id
  * offsets, append-only interval planning, loud rewrite refusal,
  * checkpointed restarts. */
class SpjStreamSpec extends SparkSpec {

  private def withSpj[T](root: String, cat: String)(body: => T): T = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    body
  }

  private def drain(cat: String, table: String, ck: String, sink: String): Unit = {
    val q = spark.readStream.table(s"$cat.$table").writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, id: Long) =>
        new Lakehouse(spark, sinkRoot).appendOnce(df, sink, batchId = id); ()
      }
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()
  }

  private var sinkRoot: String = _

  test("readStream.table tails a catalog table: bootstrap + per-commit deltas, exactly-once restart") {
    val root = java.nio.file.Files.createTempDirectory("graft-sst").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-sst-ck").toString
    sinkRoot = java.nio.file.Files.createTempDirectory("graft-sst-sink").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 20L).map(k => (k, s"v$k")).toDF("k", "v"),
      "sst_t", Seq("bucket(4,k)"))
    withSpj(root, "sstc") {
      drain("sstc", "sst_t", ck, "sst_sink")
      val sink = new Lakehouse(spark, sinkRoot)
      assert(sink.read("sst_sink").count() === 20L)
      // two more commits, then a SECOND run on the SAME checkpoint:
      // only the delta lands, exactly once
      lake.append(Seq((21L, "v21")).toDF("k", "v"), "sst_t", Seq("bucket(4,k)"))
      lake.append(Seq((22L, "v22")).toDF("k", "v"), "sst_t", Seq("bucket(4,k)"))
      drain("sstc", "sst_t", ck, "sst_sink")
      assert(sink.read("sst_sink").count() === 22L)
      assert(sink.read("sst_sink").select("k").collect().map(_.getLong(0)).sorted
        === (1L to 22L).toArray)
      // an idle third run moves nothing
      drain("sstc", "sst_t", ck, "sst_sink")
      assert(sink.read("sst_sink").count() === 22L)
    }
  }

  test("identity layout streams with the path-borne column injected") {
    val root = java.nio.file.Files.createTempDirectory("graft-ssi").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-ssi-ck").toString
    sinkRoot = java.nio.file.Files.createTempDirectory("graft-ssi-sink").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace(Seq(("A", 1L), ("B", 2L)).toDF("grp", "k"),
      "ssi_t", Seq("grp"))
    withSpj(root, "ssic") {
      drain("ssic", "ssi_t", ck, "ssi_sink")
      lake.append(Seq(("C", 3L)).toDF("grp", "k"), "ssi_t", Seq("grp"))
      drain("ssic", "ssi_t", ck, "ssi_sink")
      val got = new Lakehouse(spark, sinkRoot).read("ssi_sink")
        .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("k"))).toSet
      assert(got === Set(("A", 1L), ("B", 2L), ("C", 3L)))
    }
  }

  test("end-to-end catalog loop: readStream.table -> writeStream.toTable, exactly-once epochs") {
    val root = java.nio.file.Files.createTempDirectory("graft-ssl").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-ssl-ck").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 15L).map(k => (k, k * 2.0)).toDF("k", "w"),
      "ssl_bronze", Seq("bucket(4,k)"))
    withSpj(root, "sslc") {
      spark.sql("CREATE TABLE sslc.ssl_silver (k BIGINT, w DOUBLE) " +
        "PARTITIONED BY (bucket(4, k))")
      def loop(): Unit = {
        val q = spark.readStream.table("sslc.ssl_bronze").writeStream
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .toTable("sslc.ssl_silver")
        try assert(q.awaitTermination(120000)) finally q.stop()
      }
      loop() // bootstrap epoch
      assert(spark.table("sslc.ssl_silver").count() === 15L)
      lake.append(Seq((16L, 32.0)).toDF("k", "w"), "ssl_bronze", Seq("bucket(4,k)"))
      loop() // delta epoch
      assert(spark.table("sslc.ssl_silver").count() === 16L)
      val snaps = lake.snapshots("ssl_silver").size
      loop() // idle: no epoch data, no commit
      assert(lake.snapshots("ssl_silver").size === snaps,
        "an empty epoch must not commit a snapshot")
      assert(spark.table("sslc.ssl_silver").select("k").collect()
        .map(_.getLong(0)).sorted === (1L to 16L).toArray)
      // the silver landed UNDER THE LAYOUT: it SPJ-joins the bronze
      // with no Exchange
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val j = spark.table("sslc.ssl_silver").join(
        spark.table("sslc.ssl_bronze").select(col("k").as("k2")), col("k") === col("k2"))
      assert(!graft.operators.Medallion.plansShuffle(j))
      assert(j.count() === 16L)
    }
  }

  test("a MERGE-ON-READ delete inside the interval fails the stream loudly; the skip option opts out") {
    val root = java.nio.file.Files.createTempDirectory("graft-ssd").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-ssd-ck").toString
    sinkRoot = java.nio.file.Files.createTempDirectory("graft-ssd-sink").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 12L).map(k => (k, k % 3)).toDF("k", "g"),
      "ssd_t", Seq("bucket(2,k)"))
    withSpj(root, "ssdc") {
      drain("ssdc", "ssd_t", ck, "ssd_sink")
      assert(new Lakehouse(spark, sinkRoot).read("ssd_sink").count() === 12L)
      // a MoR delete adds ONLY a tombstone dir — the appended-entry
      // diff is blind to it; silently continuing would diverge the
      // replica, so the interval must refuse NAMING the tombstone
      lake.deleteWhereMor(col("g") === 0, "ssd_t")
      lake.append(Seq((13L, 1L)).toDF("k", "g"), "ssd_t", Seq("bucket(2,k)"))
      val e = intercept[Exception] { drain("ssdc", "ssd_t", ck, "ssd_sink") }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(m => m.contains("merge-on-read DELETE") &&
        m.contains("_deletes-")),
        s"expected the loud MoR-delete refusal naming the tombstone, got: ${
          messages(e).mkString(" | ")}")
      // Iceberg's escape hatch: skip the delete snapshots knowingly —
      // appended rows stream, the deletes' effect is ignored by choice
      val ck2 = java.nio.file.Files.createTempDirectory("graft-ssd-ck2").toString
      val q = spark.readStream
        .option("streaming-skip-delete-snapshots", "true")
        .table("ssdc.ssd_t").writeStream
        .option("checkpointLocation", ck2)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          new Lakehouse(spark, sinkRoot).appendOnce(df, "ssd_skip", batchId = id); ()
        }
        .start()
      try assert(q.awaitTermination(120000)) finally q.stop()
      // the bootstrap under the option reads the CURRENT snapshot with
      // deletes applied (the anti-filtering reader): 12 - 4 + 1
      assert(new Lakehouse(spark, sinkRoot).read("ssd_skip").count() === 9L)
      // and a TAILING interval under the option streams later appends
      // even when another MoR delete lands mid-interval
      lake.deleteWhereMor(col("k") === 2L, "ssd_t")
      lake.append(Seq((14L, 2L)).toDF("k", "g"), "ssd_t", Seq("bucket(2,k)"))
      val q2 = spark.readStream
        .option("streaming-skip-delete-snapshots", "true")
        .table("ssdc.ssd_t").writeStream
        .option("checkpointLocation", ck2)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          new Lakehouse(spark, sinkRoot).appendOnce(df, "ssd_skip", batchId = id); ()
        }
        .start()
      try assert(q2.awaitTermination(120000)) finally q2.stop()
      assert(new Lakehouse(spark, sinkRoot).read("ssd_skip").count() === 10L,
        "the tailing interval must deliver the append and skip the delete by choice")
    }
  }

  test("a rewrite inside the interval fails the stream loudly (append-only contract)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ssr").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-ssr-ck").toString
    sinkRoot = java.nio.file.Files.createTempDirectory("graft-ssr-sink").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"),
      "ssr_t", Seq("bucket(2,k)"))
    withSpj(root, "ssrc") {
      drain("ssrc", "ssr_t", ck, "ssr_sink")
      // CoW delete rewrites a dir out of the snapshot: the next
      // interval is not append-only and must refuse
      lake.deleteWhere(col("k") === 3L, "ssr_t", Seq("bucket(2,k)"))
      val e = intercept[Exception] { drain("ssrc", "ssr_t", ck, "ssr_sink") }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("REWRITTEN")),
        s"expected the loud rewrite refusal, got: ${messages(e).mkString(" | ")}")
    }
  }
}
