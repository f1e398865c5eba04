package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Medallion
import graft.sources.{Lakehouse, SpjEqTombstone, SpjEqTombstoneFiles, SpjPosTombstone, SpjPosTombstoneFiles}
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

  test("above-gate EQUALITY tombstones serve lazily: zero driver keys, one executor load shared by all tasks, reads row-equal") {
    val root = freshRoot("spj-lazyeq")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 200L).map(k => (k, s"v$k")).toDF("k", "v"),
      "lze", Seq("bucket(4,k)"))
    lake.deleteByKeyMor(Seq(3L, 9L, 40L, 77L).toDF("k"), "lze")
    val expect = (1L to 200L).filterNot(Set(3L, 9L, 40L, 77L)).map(k => s"$k|v$k").sorted
    withGate(1L) {
      // the REPRESENTATION is the claim: above the gate no key set is
      // collect()ed — the layout holds key columns + slices only
      val dels = lake.spjLayout("lze").deletes
      assert(dels.nonEmpty && dels.forall(_.isInstanceOf[SpjEqTombstoneFiles]),
        s"above the gate every equality tombstone must stay on disk: $dels")
      assert(dels.collect { case t: SpjEqTombstoneFiles => t }
        .forall(t => t.keyCols.map(_._1) == Seq("k") && t.slices.nonEmpty))
      // the probe AGREES — it advertises exactly what the load serves
      assert(lake.spjServableSpec("lze").isDefined,
        "the probe must advertise a lazily-servable equality tombstone")
      withSpj(root, "spj_ts2") {
        assert(spark.sql("SHOW TABLES IN spj_ts2").collect()
          .map(_.getString(1)).contains("lze"))
        graft.sources.spj.SpjEqKeyCache.clear()
        val before = graft.sources.spj.SpjEqKeyCache.loads.get()
        val got = spark.table("spj_ts2.lze")
        assert(sortedRows(got) === expect)
        // 4 bucket tasks probed, the key set materialized ONCE per JVM
        assert(graft.sources.spj.SpjEqKeyCache.loads.get() === before + 1,
          "N tasks must share one executor-side key-set load")
        assert(sortedRows(lake.read("lze")) === expect)
        // pruned projection still anti-filters (the key column rides
        // as an extra read, dropped by the final projection)
        assert(got.select("v").count() === expect.size)
        // the Exchange-free join property survives the lazy eq path
        lake.createOrReplace((1L to 200L).map(k => (k, k * 2.0)).toDF("dk", "x"),
          "lzed", Seq("bucket(4,dk)"))
        val j = got.join(spark.table("spj_ts2.lzed"), col("k") === col("dk"))
        assert(!Medallion.plansShuffle(j),
          "lazy equality tombstones must not cost the SPJ join its co-partitioning:\n" +
            j.queryExecution.executedPlan)
        assert(j.count() === expect.size)
        // exactness claims keep declining on a tombstoned snapshot
        assert(got.limit(198).count() === expect.size.toLong)
      }
    }
    // back under the (default) gate: the broadcast representation
    // returns and answers identically
    val dels2 = lake.spjLayout("lze").deletes
    assert(dels2.nonEmpty && dels2.forall(_.isInstanceOf[SpjEqTombstone]),
      s"under the gate equality tombstones broadcast: $dels2")
    withSpj(root, "spj_ts2b") {
      assert(sortedRows(spark.table("spj_ts2b.lze")) === expect)
    }
  }

  test("above-gate EQUALITY tombstones compose with schema evolution: renamed key binds, later appends re-insert") {
    val root = freshRoot("spj-lazyeq-evo")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 80L).map(k => (k, k * 10)).toDF("id", "m"),
      "lzev", Seq("bucket(4,id)"))
    lake.deleteByKeyMor(Seq(5L, 6L, 7L).toDF("id"), "lzev")
    // rename the KEY column after the delete: keyCols forward-map
    lake.renameColumn("lzev", "id", "doc_id")
    // a later append re-inserts a deleted key (seq-gating: it stays)
    lake.append(Seq((6L, 606L)).toDF("doc_id", "m"), "lzev", Seq("bucket(4,doc_id)"))
    val expect = ((1L to 80L).filterNot(Set(5L, 6L, 7L)).map(k => s"$k|${k * 10}") ++
      Seq("6|606")).sorted
    withGate(1L) {
      val dels = lake.spjLayout("lzev").deletes
      assert(dels.collect { case t: SpjEqTombstoneFiles => t }
        .forall(_.keyCols.map(_._1) == Seq("doc_id")),
        s"the lazy key column must forward-map through the rename: $dels")
      withSpj(root, "spj_ts2e") {
        assert(sortedRows(spark.table("spj_ts2e.lzev")
          .select("doc_id", "m")) === expect)
      }
      assert(sortedRows(lake.read("lzev").select("doc_id", "m")) === expect)
    }
  }

  test("equality keys WITHOUT a canonical comparison domain refuse at plan time, and the probe agrees (any gate)") {
    val root = freshRoot("spj-eqbin")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 30L).map(k => (k, Array(k.toByte), s"v$k"))
      .toDF("k", "b", "v"), "eqb", Seq("bucket(4,k)"))
    // an equality tombstone keyed on a BINARY column: no canonical
    // comparison domain — canonKey cannot probe it on either
    // representation, so BOTH the probe and the load must refuse
    // (the ORDINARY read path still serves: its anti-join is a plain
    // DataFrame null-safe join, no canonicalization involved)
    lake.deleteByKeyMor(Seq(Array(3.toByte), Array(9.toByte)).toDF("b"), "eqb")
    val expect = (1L to 30L).filterNot(k => k == 3L || k == 9L)
      .map(k => s"$k|v$k").sorted
    assert(sortedRows(lake.read("eqb").select("k", "v")) === expect)
    for (gate <- Seq(1L, Lakehouse.SpjTombstoneGateBytes)) withGate(gate) {
      assert(lake.spjServableSpec("eqb").isEmpty,
        s"the probe must refuse a binary equality key (gate=$gate)")
      val e = intercept[Exception](lake.spjLayout("eqb"))
      assert(e.getMessage.contains("compact()"),
        s"the load must refuse loudly with the exit named (gate=$gate): ${e.getMessage}")
    }
    // the ergonomics exit works: converting to positional serves
    lake.rewritePositionDeletes("eqb")
    assert(lake.spjServableSpec("eqb").isDefined)
    withSpj(root, "spj_eqb") {
      assert(sortedRows(spark.table("spj_eqb.eqb").select("k", "v")) === expect)
    }
  }

  test("above-gate MIXED positional + equality tombstones compose on one snapshot") {
    val root = freshRoot("spj-lazymix")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 100L).map(k => (k, k % 5)).toDF("k", "g"),
      "lzm", Seq("bucket(4,k)"))
    lake.deleteWhereMor(col("g") === 0, "lzm") // positional
    lake.deleteByKeyMor(Seq(7L, 11L).toDF("k"), "lzm") // equality
    val expect = (1L to 100L).filter(k => k % 5 != 0 && k != 7L && k != 11L)
      .map(k => s"$k|${k % 5}").sorted
    withGate(1L) {
      val dels = lake.spjLayout("lzm").deletes
      assert(dels.exists(_.isInstanceOf[SpjPosTombstoneFiles]) &&
        dels.exists(_.isInstanceOf[SpjEqTombstoneFiles]),
        s"both kinds must stay on disk above the gate: $dels")
      withSpj(root, "spj_ts2m") {
        assert(sortedRows(spark.table("spj_ts2m.lzm")) === expect)
      }
    }
    assert(sortedRows(lake.read("lzm")) === expect)
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

  test("executor key cache is COMPACT and BYTE-BOUNDED: primitive long sets, LRU byte eviction, loud over-budget refusal (r18)") {
    import graft.sources.spj.SpjEqKeyCache
    val root = freshRoot("spj-eqbudget")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      "bga", Seq("bucket(4,k)"))
    lake.deleteByKeyMor((1L to 100L).filter(_ % 2 == 0).toDF("k"), "bga")
    lake.createOrReplace((1L to 400L).map(k => (k, k * 3)).toDF("k", "m"),
      "bgb", Seq("bucket(4,k)"))
    lake.deleteByKeyMor((200L to 240L).toDF("k"), "bgb")
    val expA = (1L to 400L).filterNot(k => k <= 100L && k % 2 == 0)
      .map(k => s"$k|v$k").sorted
    val expB = (1L to 400L).filterNot(k => k >= 200L && k <= 240L)
      .map(k => s"$k|${k * 3}").sorted
    withGate(1L) {
      withSpj(root, "spj_bgt") {
        // 1) representation: a long-key tombstone materializes as a
        // primitive array priced at ~8 bytes/key, and cachedBytes
        // accounts for it
        SpjEqKeyCache.clear()
        assert(SpjEqKeyCache.cachedBytes === 0L)
        assert(sortedRows(spark.table("spj_bgt.bga")) === expA)
        val afterA = SpjEqKeyCache.cachedBytes
        assert(afterA > 0L && afterA < 16L * 50 + 64L,
          s"50 long keys must retain ~8 bytes each, got $afterA")
        // 2) LRU byte eviction: a budget that fits only ONE set keeps
        // total retained bytes under budget; the evicted set reloads
        // on its next probe and stays row-equal
        val budget = afterA + 200L // fits one ~400-byte set, not two
        System.setProperty(SpjEqKeyCache.BudgetKey, budget.toString)
        try {
          assert(sortedRows(spark.table("spj_bgt.bgb")) === expB)
          assert(SpjEqKeyCache.cachedBytes <= budget,
            s"retained ${SpjEqKeyCache.cachedBytes} must stay under budget $budget")
          val loadsBefore = SpjEqKeyCache.loads.get()
          assert(sortedRows(spark.table("spj_bgt.bga")) === expA)
          assert(SpjEqKeyCache.loads.get() > loadsBefore,
            "the evicted set must RELOAD on its next probe")
          assert(SpjEqKeyCache.cachedBytes <= budget)
          // 3) a SINGLE tombstone over the budget refuses loudly with
          // the documented exit named — never an OOM mid-task
          System.setProperty(SpjEqKeyCache.BudgetKey, "64")
          SpjEqKeyCache.clear()
          val e = intercept[Exception] {
            spark.table("spj_bgt.bga").count()
          }
          def chain(t: Throwable): Seq[String] =
            if (t == null) Nil else String.valueOf(t.getMessage) +: chain(t.getCause)
          assert(chain(e).exists(_.contains("rewrite_position_deletes")),
            s"over-budget load must name the exit: ${chain(e)}")
        } finally System.clearProperty(SpjEqKeyCache.BudgetKey)
        // budget restored: serves again
        SpjEqKeyCache.clear()
        assert(sortedRows(spark.table("spj_bgt.bga")) === expA)
      }
    }
  }

  test("above-gate STRING and MULTI-COLUMN equality keys take the compact representations, reads row-equal (r18)") {
    import graft.sources.spj.SpjEqKeyCache
    val root = freshRoot("spj-eqrepr")
    val lake = new Lakehouse(spark, root)
    // string key: sorted-array representation
    lake.createOrReplace((1L to 90L).map(k => (s"id$k", k)).toDF("sk", "n"),
      "rps", Seq("bucket(4,sk)"))
    lake.deleteByKeyMor(Seq("id7", "id40", "id88").toDF("sk"), "rps")
    val expS = (1L to 90L).filterNot(Set(7L, 40L, 88L))
      .map(k => s"id$k|$k").sorted
    // two-column key: generic hash-sorted representation
    lake.createOrReplace((1L to 90L).map(k => (k % 9, s"g${k % 7}", k))
      .toDF("a", "b", "n"), "rpm", Seq("bucket(4,n)"))
    lake.deleteByKeyMor(Seq((3L, "g4"), (5L, "g0")).toDF("a", "b"), "rpm")
    val expM = (1L to 90L)
      .filterNot(k => (k % 9 == 3 && k % 7 == 4) || (k % 9 == 5 && k % 7 == 0))
      .map(k => s"${k % 9}|g${k % 7}|$k").sorted
    withGate(1L) {
      withSpj(root, "spj_rpr") {
        SpjEqKeyCache.clear()
        assert(sortedRows(spark.table("spj_rpr.rps")) === expS)
        assert(sortedRows(spark.table("spj_rpr.rpm")) === expM)
      }
    }
    // and under the gate the broadcast branch agrees
    assert(sortedRows(lake.read("rps")) === expS)
    assert(sortedRows(lake.read("rpm")) === expM)
  }
}
