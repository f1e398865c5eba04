package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Medallion
import graft.sources.{Lakehouse, SpjPosTombstone, SpjPosTombstoneFiles}
import graft.sources.spj.GraftSpjCatalog

/** The SPJ plan-time tombstone materialization is BOUNDED (round-14's
  * scale fix): under `spark.graft.spj.tombstone-broadcast-bytes` of
  * on-disk tombstone bytes the payload collects and broadcasts as
  * before; above it, POSITIONAL tombstones never touch the driver —
  * the layout carries only slice paths + `__file` footer bounds and
  * each task anti-joins its own file's slices executor-side (Iceberg's
  * position-delete read path) — and EQUALITY tombstones refuse loudly
  * (probe and layout agreeing). A wide MoR update on a 100 TB table
  * must PLAN without the driver holding billions of (file, pos) rows;
  * these legs force the gate low to pin the mechanism, and the Stress
  * main exercises a multi-million-row tombstone at a realistic gate. */
class SpjTombstoneScaleSpec extends SparkSpec {

  import spark.implicits._

  private val GateKey = "spark.graft.spj.tombstone-broadcast-bytes"

  private def withGate[T](bytes: Long)(body: => T): T = {
    spark.conf.set(GateKey, bytes.toString)
    try body finally spark.conf.unset(GateKey)
  }

  private def withSpj[T](root: String, cat: String)(body: => T): T = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("above-gate POSITIONAL tombstones: zero driver materialization, executor-side anti-join, reads row-equal") {
    val root = freshRoot("spj-lazypos")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 200L).map(k => (k, k % 4, k * 1.0)).toDF("k", "g", "w"),
      "lzt", Seq("bucket(4,k)"))
    lake.deleteWhereMor(col("g") === 0, "lzt")
    lake.updateWhereMor(Seq("w" -> (col("w") + 500.0)), col("g") === 1, "lzt",
      Seq("bucket(4,k)"))
    val expect = (1L to 200L).filterNot(_ % 4 == 0).map(k =>
      s"$k|${k % 4}|${if (k % 4 == 1) k * 1.0 + 500 else k * 1.0}").sorted
    withGate(1L) {
      // the REPRESENTATION is the claim: above the gate no positional
      // payload is collect()ed — the layout holds slices, not byFile
      val dels = lake.spjLayout("lzt").deletes
      assert(dels.nonEmpty && dels.forall(_.isInstanceOf[SpjPosTombstoneFiles]),
        s"above the gate every positional tombstone must stay on disk: $dels")
      // slice bounds come from the slices' own footers — populated, so
      // a task opens only the slices naming ITS file
      assert(dels.collect { case t: SpjPosTombstoneFiles => t }
        .forall(_.slices.forall(_._3.isDefined)),
        "every slice must carry __file footer bounds for per-task pruning")
      withSpj(root, "spj_ts1") {
        val got = spark.table("spj_ts1.lzt")
        assert(sortedRows(got) === expect)
        assert(sortedRows(lake.read("lzt")) === expect)
        // pruned projection still anti-joins (index-based, column-free)
        assert(got.select("w").count() === expect.size)
        // the Exchange-free join property survives the lazy path
        lake.createOrReplace((1L to 200L).map(k => (k, k * 2.0)).toDF("dk", "x"),
          "lzd", Seq("bucket(4,dk)"))
        val j = got.join(spark.table("spj_ts1.lzd"), col("k") === col("dk"))
        assert(!Medallion.plansShuffle(j),
          "lazy tombstones must not cost the SPJ join its co-partitioning:\n" +
            j.queryExecution.executedPlan)
        assert(j.count() === expect.size)
        // exactness claims keep declining on a tombstoned snapshot
        assert(got.limit(180).count() === expect.size.toLong)
      }
    }
    // back under the (default) gate: the broadcast representation
    // returns and answers identically
    val dels2 = lake.spjLayout("lzt").deletes
    assert(dels2.nonEmpty && dels2.forall(_.isInstanceOf[SpjPosTombstone]),
      s"under the gate positional tombstones broadcast: $dels2")
    withSpj(root, "spj_ts1b") {
      assert(sortedRows(spark.table("spj_ts1b.lzt")) === expect)
    }
  }

  test("above-gate EQUALITY tombstones refuse loudly, and the probe agrees (never advertise the unservable)") {
    val root = freshRoot("spj-lazyeq")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 50L).map(k => (k, s"v$k")).toDF("k", "v"),
      "lze", Seq("bucket(4,k)"))
    lake.deleteByKeyMor(Seq(3L, 9L).toDF("k"), "lze")
    withGate(1L) {
      assert(lake.spjServableSpec("lze").isEmpty,
        "the probe must refuse an equality tombstone above the gate")
      val e = intercept[IllegalArgumentException](lake.spjLayout("lze"))
      assert(e.getMessage.contains("broadcast gate"),
        s"wanted the gate refusal, got: ${e.getMessage}")
      withSpj(root, "spj_ts2") {
        assert(!spark.sql("SHOW TABLES IN spj_ts2").collect()
          .map(_.getString(1)).contains("lze"))
      }
    }
    // at the default gate the same table serves
    assert(lake.spjServableSpec("lze").isDefined)
    withSpj(root, "spj_ts2b") {
      assert(spark.table("spj_ts2b.lze").count() === 48)
    }
  }

  test("the ORDINARY read's tombstone anti-join drops its broadcast hint above the gate") {
    val root = freshRoot("spj-obc")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 120L).map(k => (k, k % 4)).toDF("k", "g"),
      "obc", Seq("bucket(4,k)"))
    lake.deleteWhereMor(col("g") === 0, "obc")
    def broadcastJoins(df: org.apache.spark.sql.DataFrame): Boolean = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def walk(p: SparkPlan): Boolean = p match {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan) || walk(a.initialPlan)
        case other => other.children.exists(walk) || other.subqueries.exists(walk)
      }
      walk(df.queryExecution.executedPlan)
    }
    val expect = (1L to 120L).count(_ % 4 != 0).toLong
    // under the (default) gate: the deleted-row-sized tombstone rides a
    // broadcast anti-join
    val under = lake.read("obc")
    assert(under.count() === expect)
    assert(broadcastJoins(under), "an under-gate tombstone should broadcast:\n" +
      under.queryExecution.executedPlan)
    withGate(1L) {
      // above the gate the HINT drops (Spark stays free to broadcast a
      // side it sizes as small — disable auto-broadcast to observe the
      // hint's absence): the anti-join plans shuffle-side, so executor
      // memory never scales with the payload
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val over = lake.read("obc")
        assert(over.count() === expect)
        assert(!broadcastJoins(over),
          "an above-gate tombstone must not force a broadcast anti-join:\n" +
            over.queryExecution.executedPlan)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("streaming bootstrap over above-gate tombstones anti-filters executor-side") {
    val root = freshRoot("spj-lazystream")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 60L).map(k => (k, k % 3)).toDF("k", "g"),
      "lzs", Seq("bucket(4,k)"))
    lake.deleteWhereMor(col("g") === 0, "lzs")
    withGate(1L) {
      withSpj(root, "spj_ts3") {
        val ckpt = freshRoot("spj-lazystream-ckpt")
        val out = freshRoot("spj-lazystream-out")
        spark.readStream.table("spj_ts3.lzs").writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination(120000)
        val emitted = spark.read.parquet(out)
        assert(emitted.count() === (1L to 60L).count(_ % 3 != 0))
        assert(emitted.where(col("g") === 0).count() === 0)
      }
    }
  }
}
