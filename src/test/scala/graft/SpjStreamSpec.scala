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

  test("CDC on the catalog stream: a MoR update arrives as delete+insert; a replica reconstructs exactly") {
    val root = java.nio.file.Files.createTempDirectory("graft-sscdc").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-sscdc-ck").toString
    val repRoot = java.nio.file.Files.createTempDirectory("graft-sscdc-rep").toString
    val lake = new Lakehouse(spark, root)
    val rep = new Lakehouse(spark, repRoot)
    import spark.implicits._
    lake.createOrReplace((1L to 30L).map(k => (k, s"v$k", k * 1.0)).toDF("k", "v", "w"),
      "cdt", Seq("bucket(4,k)"))
    withSpj(root, "sscdc") {
      // collected change batches (for shape assertions) + the replica
      val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
      def drainCdc(): Unit = {
        val q = spark.readStream.option("cdc", "true").table("sscdc.cdt")
          .select(col("k"), col("v"), col("w"), col("_change_type"))
          .writeStream.option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, id: Long) =>
            val rows = df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
            batches.synchronized { batches += ((id, rows)) }
            rep.applyChangesOnce(df, "cdt_rep", Seq("k"), id); ()
          }
          .start()
        try assert(q.awaitTermination(120000)) finally q.stop()
      }
      def replicaExact(): Unit = {
        val p = lake.read("cdt")
        val r = rep.read("cdt_rep")
        assert(p.exceptAll(r).isEmpty && r.exceptAll(p).isEmpty,
          "replica must equal the primary row-for-row")
      }
      // bootstrap: the full snapshot as inserts
      drainCdc(); replicaExact()
      assert(batches.flatMap(_._2).forall(_.endsWith("|insert")))
      // interval with a MoR DELETE (k=3,7), a MoR UPDATE (w*10 on k=5)
      // and an APPEND — deletes must arrive as `delete` rows, the
      // update as its old image's delete plus its new image's insert
      lake.deleteWhereMor(col("k").isin(3L, 7L), "cdt")
      lake.updateWhereMor(Seq("w" -> (col("w") * 10)), col("k") === 5L, "cdt",
        Seq("bucket(4,k)"))
      lake.append(Seq((31L, "v31", 31.0)).toDF("k", "v", "w"), "cdt", Seq("bucket(4,k)"))
      batches.clear()
      drainCdc(); replicaExact()
      val tail = batches.flatMap(_._2)
      assert(tail.count(_ == "3|v3|3.0|delete") === 1)
      assert(tail.count(_ == "7|v7|7.0|delete") === 1)
      assert(tail.count(_ == "5|v5|5.0|delete") === 1) // the update's old image
      assert(tail.count(_ == "5|v5|50.0|insert") === 1) // and its new image
      assert(tail.count(_ == "31|v31|31.0|insert") === 1)
      assert(tail.count(_.endsWith("|delete")) === 3)
      // a row inserted AND deleted INSIDE one interval nets to nothing
      lake.append(Seq((99L, "ghost", 9.9)).toDF("k", "v", "w"), "cdt", Seq("bucket(4,k)"))
      lake.deleteWhereMor(col("k") === 99L, "cdt")
      batches.clear()
      drainCdc(); replicaExact()
      assert(!batches.flatMap(_._2).exists(_.startsWith("99|")),
        s"within-interval insert+delete must net out, got: ${batches.flatMap(_._2)}")
      // idle drain: nothing re-emits (exactly-once)
      batches.clear()
      drainCdc(); replicaExact()
      assert(batches.flatMap(_._2).isEmpty)
      // a CDC stream that selects row-id metadata too gets real values
      // alongside the tag (the emission carries the full metadataOutput)
      val ck3 = java.nio.file.Files.createTempDirectory("graft-sscdc-ck3").toString
      val metaRows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
      val q3 = spark.readStream.option("cdc", "true").table("sscdc.cdt")
        .select(col("k"), col("_file"), col("_pos"), col("_change_type"))
        .writeStream.option("checkpointLocation", ck3)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          metaRows.synchronized {
            metaRows ++= df.collect().map(r =>
              (r.getString(1), r.getLong(2), r.getString(3)))
          }; ()
        }.start()
      try assert(q3.awaitTermination(120000)) finally q3.stop()
      assert(metaRows.nonEmpty)
      assert(metaRows.forall { case (f, p, ct) =>
        f.contains("/data-") && p >= 0L && ct == "insert" })
    }
  }

  test("CDC stream composes with schema evolution: a mid-stream ALTER conforms later batches") {
    val root = java.nio.file.Files.createTempDirectory("graft-sscdcev").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-sscdcev-ck").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 12L).map(k => (k, s"v$k")).toDF("k", "v"),
      "cev", Seq("bucket(2,k)"))
    withSpj(root, "sscdcev") {
      val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      def drainCdc(cols: Seq[String]): Unit = {
        val q = spark.readStream.option("cdc", "true").table("sscdcev.cev")
          .select(cols.map(col) :+ col("_change_type"): _*)
          .writeStream.option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, _: Long) =>
            batches.synchronized {
              batches += df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
            }; ()
          }.start()
        try assert(q.awaitTermination(120000)) finally q.stop()
      }
      drainCdc(Seq("k", "v")) // bootstrap: 12 inserts
      assert(batches.flatten.size === 12)
      // mid-stream: nested-free ALTER (add w/ default + rename),
      // a MoR delete, and a post-evolution append — one interval
      spark.sql("ALTER TABLE sscdcev.cev ADD COLUMNS (tier STRING DEFAULT 'basic')")
      spark.sql("ALTER TABLE sscdcev.cev RENAME COLUMN v TO label")
      lake.deleteWhereMor(col("k") === 5L, "cev")
      spark.sql("INSERT INTO sscdcev.cev VALUES (13, 'v13', 'gold')")
      batches.clear()
      // the restart re-resolves the (evolved) schema: old checkpoints
      // carry snapshot offsets only, so a widened column set serves
      drainCdc(Seq("k", "label", "tier"))
      val tail = batches.flatten
      // the delete's old image conforms: renamed column resolves, the
      // defaulted column reads its default
      assert(tail.count(_ == "5|v5|basic|delete") === 1, s"got: $tail")
      assert(tail.count(_ == "13|v13|gold|insert") === 1)
      assert(tail.size === 2)
    }
  }

  test("CDC delete events survive a URL-encodable table root (space in path)") {
    // positional-tombstone byFile keys are decoded Hadoop-Path form;
    // the reader's `_file` is the URL-encoded SparkPath form — on a
    // root with a space the two differ, and r16 normalizes both the
    // planning filter and the per-row semi lookup so deletes still
    // propagate (they used to silently drop, diverging the replica)
    val root = java.nio.file.Files.createTempDirectory("graft enc cdc").toString
    assert(root.contains(" "), "the test root must carry a URL-encodable char")
    val ck = java.nio.file.Files.createTempDirectory("graft-enccdc-ck").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 20L).map(k => (k, s"v$k")).toDF("k", "v"),
      "enc_t", Seq("bucket(2,k)"))
    withSpj(root, "ssenc") {
      val events = scala.collection.mutable.ArrayBuffer.empty[String]
      def drainCdc(): Unit = {
        val q = spark.readStream.option("cdc", "true").table("ssenc.enc_t")
          .select(col("k"), col("v"), col("_change_type"))
          .writeStream.option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, _: Long) =>
            events.synchronized {
              events ++= df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
            }; ()
          }
          .start()
        try assert(q.awaitTermination(120000)) finally q.stop()
      }
      drainCdc() // bootstrap
      events.clear()
      // a POSITIONAL MoR delete (predicate) and an EQUALITY MoR delete
      // (by key) in one interval — both legs must emit their rows
      lake.deleteWhereMor(col("k") === 3L, "enc_t")
      lake.deleteByKeyMor(Seq(11L).toDF("k"), "enc_t")
      drainCdc()
      assert(events.count(_ == "3|v3|delete") === 1,
        s"positional delete must propagate on an encodable root, got: $events")
      assert(events.count(_ == "11|v11|delete") === 1,
        s"equality delete must propagate on an encodable root, got: $events")
      assert(events.count(_.endsWith("|delete")) === 2)
    }
  }

  test("CDC serves ABOVE-GATE positional tombstones lazily: delete events stream, zero driver materialization (r16)") {
    val root = java.nio.file.Files.createTempDirectory("graft-sslazy").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-sslazy-ck").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 40L).map(k => (k, s"v$k")).toDF("k", "v"),
      "lz_t", Seq("bucket(2,k)"))
    withSpj(root, "sslz") {
      val events = scala.collection.mutable.ArrayBuffer.empty[String]
      def drainCdc(): Unit = {
        val q = spark.readStream.option("cdc", "true").table("sslz.lz_t")
          .select(col("k"), col("_change_type"))
          .writeStream.option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, _: Long) =>
            events.synchronized {
              events ++= df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
            }; ()
          }
          .start()
        try assert(q.awaitTermination(120000)) finally q.stop()
      }
      drainCdc() // bootstrap
      events.clear()
      spark.conf.set("spark.graft.spj.tombstone-broadcast-bytes", "1")
      try {
        lake.deleteWhereMor(col("k") % 5 === 0, "lz_t")
        // the REPRESENTATION is the claim: the tombstone stayed on disk
        val dels = lake.spjLayout("lz_t").deletes
        assert(dels.nonEmpty &&
          dels.forall(_.isInstanceOf[graft.sources.SpjPosTombstoneFiles]),
          s"above the gate the positional payload must stay on disk: $dels")
        drainCdc()
        val expect = (1L to 40L).filter(_ % 5 == 0).map(k => s"$k|delete").sorted
        assert(events.sorted.toSeq === expect,
          s"above-gate positional deletes must stream, got: ${events.sorted}")
        // idle drain: exactly-once
        events.clear(); drainCdc()
        assert(events.isEmpty)
      } finally spark.conf.unset("spark.graft.spj.tombstone-broadcast-bytes")
    }
  }

  test("CDC serves ABOVE-GATE equality tombstones lazily: delete events stream, the driver never holds a key (r17)") {
    val root = java.nio.file.Files.createTempDirectory("graft-sslzeq").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-sslzeq-ck").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 40L).map(k => (k, s"v$k")).toDF("k", "v"),
      "lzeq_t", Seq("bucket(2,k)"))
    withSpj(root, "sslzeq") {
      val events = scala.collection.mutable.ArrayBuffer.empty[String]
      def drainCdc(): Unit = {
        val q = spark.readStream.option("cdc", "true").table("sslzeq.lzeq_t")
          .select(col("k"), col("_change_type"))
          .writeStream.option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, _: Long) =>
            events.synchronized {
              events ++= df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
            }; ()
          }
          .start()
        try assert(q.awaitTermination(120000)) finally q.stop()
      }
      drainCdc() // bootstrap
      events.clear()
      spark.conf.set("spark.graft.spj.tombstone-broadcast-bytes", "1")
      try {
        lake.deleteByKeyMor((1L to 40L).filter(_ % 5 == 0).toDF("k"), "lzeq_t")
        // the REPRESENTATION is the claim: the key set stayed on disk
        val dels = lake.spjLayout("lzeq_t").deletes
        assert(dels.nonEmpty &&
          dels.forall(_.isInstanceOf[graft.sources.SpjEqTombstoneFiles]),
          s"above the gate the equality key set must stay on disk: $dels")
        drainCdc()
        val expect = (1L to 40L).filter(_ % 5 == 0).map(k => s"$k|delete").sorted
        assert(events.sorted.toSeq === expect,
          s"above-gate equality deletes must stream, got: ${events.sorted}")
        // idle drain: exactly-once
        events.clear(); drainCdc()
        assert(events.isEmpty)
        // a LATER append re-inserts a deleted key: only an insert event
        lake.append(Seq((10L, "renew")).toDF("k", "v"), "lzeq_t",
          Seq("bucket(2,k)"))
        drainCdc()
        assert(events.sorted.toSeq === Seq("10|insert"),
          s"seq-gating must let later appends re-insert deleted keys: $events")
      } finally spark.conf.unset("spark.graft.spj.tombstone-broadcast-bytes")
    }
  }

  test("batch reads serve _change_type as the constant insert") {
    val root = java.nio.file.Files.createTempDirectory("graft-ssct").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 8L).map(k => (k, s"v$k")).toDF("k", "v"),
      "ctb", Seq("bucket(2,k)"))
    withSpj(root, "ssctc") {
      val got = spark.table("ssctc.ctb").select(col("k"), col("_change_type"))
      assert(got.count() === 8L)
      assert(got.where(col("_change_type") =!= "insert").count() === 0L)
      // hidden unless named: SELECT * stays the data schema
      assert(!spark.table("ssctc.ctb").columns.contains("_change_type"))
    }
  }
}
