package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.sources.{Lakehouse, Transforms}

/** Hidden partitioning (Iceberg partition transforms): the layout is
  * derived from source columns (`days(ts)`, `bucket(n,k)`,
  * `truncate(w,c)`…), invisible in the table's schema, and pruned
  * against by predicates on the SOURCE column — no query rewrites.
  * Reference: the Iceberg catalog tables behind
  * mongo_to_iceberg.py:140 get this from Iceberg's partition specs. */
class HiddenPartitioningSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-hidden").toString

  import scala.jdk.CollectionConverters._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDf = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 03:00:00"), "a", 10.0),
      (2L, ts("2024-01-01 17:30:00"), "b", 20.0),
      (3L, ts("2024-01-02 08:15:00"), "a", 30.0),
      (4L, ts("2024-01-03 23:59:59"), "c", 40.0),
      (5L, ts("2024-02-10 12:00:00"), "b", 50.0),
      (6L, ts("2025-06-01 00:00:00"), "a", 60.0)
    ).toDF("id", "event_ts", "cat", "amount")
  }

  test("days(ts): layout is physical, schema is clean, rows round-trip") {
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf, "ev", partitionBy = Seq("days(event_ts)"))
    // physical tree uses the derived column; 5 distinct days
    assert(lake.dirLayout("ev", "data-1") === Seq("days(event_ts)"))
    // the USER schema never shows the layout column
    val got = lake.read("ev")
    assert(got.columns.toSet === Set("id", "event_ts", "cat", "amount"))
    assert(got.count() === 6)
    assert(got.where(col("id") === 2).head().getTimestamp(1) === ts("2024-01-01 17:30:00"))
  }

  test("days(ts): a time-range predicate on the SOURCE column prunes to matching day leaves") {
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf, "ev", partitionBy = Seq("days(event_ts)"))
    val pruned = lake.readWhere(
      col("event_ts") >= lit(ts("2024-01-02 00:00:00")) &&
        col("event_ts") < lit(ts("2024-01-04 00:00:00")), "ev")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    // 5 day-leaves exist; only the 2 matching days' files open
    assert(pruned.inputFiles.length === 2,
      s"expected 2 day-leaf files, read ${pruned.inputFiles.length}")
    // string timestamp literals map through the same transform
    val eq = lake.readWhere(col("event_ts") >= "2025-01-01 00:00:00", "ev")
    assert(eq.inputFiles.length === 1 && eq.head().getLong(0) === 6L)
  }

  test("months/years on a DATE column prune string-literal date ranges") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val df = Seq(
      (1L, Date.valueOf("2023-03-15")),
      (2L, Date.valueOf("2023-11-02")),
      (3L, Date.valueOf("2024-01-20")),
      (4L, Date.valueOf("2024-07-04"))
    ).toDF("k", "d").repartition(1) // one file per leaf: deterministic counts
    lake.createOrReplace(df, "md", partitionBy = Seq("months(d)"))
    assert(lake.dirLayout("md", "data-1") === Seq("months(d)"))
    val got = lake.readWhere(col("d") >= "2024-01-01", "md")
    assert(got.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    assert(got.inputFiles.length === 2,
      s"expected 2 month leaves, read ${got.inputFiles.length}")
    // years() — same df, second table
    lake.createOrReplace(df, "yd", partitionBy = Seq("years(d)"))
    val y = lake.readWhere(col("d") === Date.valueOf("2023-11-02"), "yd")
    assert(y.count() === 1 && y.inputFiles.length === 1)
  }

  test("bucket(n,k): point lookups open one bucket; schema stays clean") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val df = (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v")
    lake.createOrReplace(df, "bk", partitionBy = Seq("bucket(8, k)"))
    // canonical layout (whitespace-free) round-trips from the paths
    assert(lake.dirLayout("bk", "data-1") === Seq("bucket(8,k)"))
    assert(lake.read("bk").columns.toSet === Set("k", "v"))
    val hit = lake.readWhere(col("k") === 123L, "bk")
    assert(hit.count() === 1 && hit.head().getString(1) === "v123")
    val total = lake.read("bk").inputFiles.length
    assert(hit.inputFiles.length < total,
      s"bucket pruning must open fewer than all $total files, opened ${hit.inputFiles.length}")
  }

  test("truncate on strings and integers prunes prefix/range predicates") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val df = Seq(
      (1L, "alpha"), (2L, "amber"), (3L, "bravo"), (4L, "botox"), (5L, "zulu")
    ).toDF("k", "s").repartition(1) // one file per leaf: deterministic counts
    lake.createOrReplace(df, "ts", partitionBy = Seq("truncate(1, s)"))
    val a = lake.readWhere(col("s") === "amber", "ts")
    assert(a.count() === 1 && a.inputFiles.length === 1)
    val range = lake.readWhere(col("s") >= "b" && col("s") < "c", "ts")
    assert(range.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    assert(range.inputFiles.length === 1, "one 'b' leaf should open")

    val ints = (0L until 100L).map(k => (k, k * 2)).toDF("k", "v")
    lake.createOrReplace(ints, "ti", partitionBy = Seq("truncate(10, k)"))
    val mid = lake.readWhere(col("k") >= 35L && col("k") <= 44L, "ti")
    assert(mid.count() === 10)
    assert(mid.inputFiles.length === 2, "two width-10 leaves overlap [35,44]")
  }

  test("upsert preserves a hidden layout and rewrites only touched day leaves") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf, "ev", partitionBy = Seq("days(event_ts)"))
    // update id=3 (2024-01-02) + insert a new row on the same day
    val delta = Seq(
      (3L, ts("2024-01-02 08:15:00"), "a", 99.0),
      (7L, ts("2024-01-02 20:00:00"), "d", 70.0)
    ).toDF("id", "event_ts", "cat", "amount")
    lake.upsert(delta, "ev", keyCols = Seq("id"), partitionBy = Seq("days(event_ts)"))
    val got = lake.read("ev")
    assert(got.count() === 7)
    assert(got.where(col("id") === 3).head().getDouble(3) === 99.0)
    // untouched day leaves carry BY REFERENCE from the original dir
    val entries = lake.snapshots("ev").last._2
    val carried = entries.filter(e => e.startsWith("data-1/") )
    assert(carried.size === 4,
      s"4 of 5 original day leaves must carry by reference, got: $entries")
    assert(entries.exists(e => e.startsWith("data-") && e.contains("_p_days_event_ts=")))
  }

  test("upsert moves a key across day leaves without duplicating it") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf, "ev", partitionBy = Seq("days(event_ts)"))
    // id=4 moves from 2024-01-03 to 2024-03-01
    val delta = Seq((4L, ts("2024-03-01 01:00:00"), "c", 41.0))
      .toDF("id", "event_ts", "cat", "amount")
    lake.upsert(delta, "ev", keyCols = Seq("id"), partitionBy = Seq("days(event_ts)"))
    val got = lake.read("ev")
    assert(got.count() === 6)
    assert(got.where(col("id") === 4).count() === 1)
    assert(got.where(col("id") === 4).head().getTimestamp(1) === ts("2024-03-01 01:00:00"))
  }

  test("deleteWhere / updateWhere keep hidden layouts and stay leaf-scoped") {
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf, "ev", partitionBy = Seq("days(event_ts)"))
    lake.deleteWhere(col("event_ts") < lit(ts("2024-01-02 00:00:00")), "ev",
      partitionBy = Seq("days(event_ts)"))
    assert(lake.read("ev").count() === 4)
    // deleted day's leaf is gone; the rest carried by reference
    val entries = lake.snapshots("ev").last._2
    assert(entries.count(_.startsWith("data-1/")) === 4,
      s"other day leaves must carry by reference: $entries")
    lake.updateWhere(Seq("amount" -> (col("amount") + 1)),
      col("id") === 5L, "ev", partitionBy = Seq("days(event_ts)"))
    assert(lake.read("ev").where(col("id") === 5).head().getDouble(3) === 51.0)
    assert(lake.read("ev").columns.toSet === Set("id", "event_ts", "cat", "amount"))
  }

  test("merge-on-read delete and update work through the hidden projection") {
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf, "ev", partitionBy = Seq("days(event_ts)"))
    // positional tombstone: _metadata must resolve through the
    // dropDerived projection
    lake.deleteWhereMor(col("id") === 2L, "ev")
    assert(lake.read("ev").count() === 5)
    assert(lake.read("ev").where(col("id") === 2).count() === 0)
    lake.updateWhereMor(Seq("amount" -> (col("amount") * 10)), col("id") === 1L, "ev")
    val got = lake.read("ev")
    assert(got.count() === 5)
    assert(got.where(col("id") === 1).head().getDouble(3) === 100.0)
    // the MoR delta must NOT leak `_p_…` into data columns
    assert(got.columns.forall(!_.startsWith("_p_")))
  }

  test("MoR UPDATE delta lands under the table layout and prunes by leaf") {
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf, "ev", partitionBy = Seq("days(event_ts)"))
    // update rows on TWO distinct days (ids 1,2 on 2024-01-01; id 3 on
    // 2024-01-02) so the delta spans two day leaves
    lake.updateWhereMor(Seq("amount" -> (col("amount") + 1)),
      col("event_ts") < lit(ts("2024-01-03 00:00:00")), "ev",
      partitionBy = Seq("days(event_ts)"))
    // the delta dir is partitioned under the table's declared layout
    assert(lake.dirLayout("ev", "data-2") === Seq("days(event_ts)"),
      "MoR update delta must carry the days() layout")
    // a post-update single-day range read opens only that day's delta
    // leaf — an unpartitioned delta would open the whole delta dir
    val got = lake.readWhere(
      col("event_ts") >= lit(ts("2024-01-01 00:00:00")) &&
        col("event_ts") < lit(ts("2024-01-02 00:00:00")), "ev")
    assert(got.collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1).toSeq ===
      Seq((1L, 11.0), (2L, 21.0)))
    val openedDelta = got.inputFiles.filter(_.contains("/data-2/")).toSeq
    assert(openedDelta.nonEmpty && openedDelta.forall(_.contains("_p_days_event_ts=19723")),
      s"single-day read must open only the 2024-01-01 delta leaf; opened: $openedDelta")
  }

  test("partition evolution: identity -> days(ts); mixed layouts read, prune, and migrate") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    // v1 layout: identity on category
    lake.createOrReplace(eventsDf.where(col("id") <= 3), "ev", partitionBy = Seq("cat"))
    // evolve: new writes take days(event_ts); old dir keeps cat=…
    lake.append(eventsDf.where(col("id") > 3), "ev", partitionBy = Seq("days(event_ts)"))
    assert(lake.dirLayout("ev", "data-1") === Seq("cat"))
    assert(lake.dirLayout("ev", "data-2") === Seq("days(event_ts)"))
    assert(lake.read("ev").count() === 6)
    // a time predicate prunes inside the evolved dir (old dir has no
    // day stats for its leaves beyond file ranges — conservatively read)
    val recent = lake.readWhere(col("event_ts") >= lit(ts("2025-01-01 00:00:00")), "ev")
    assert(recent.count() === 1 && recent.head().getLong(0) === 6L)
    // upsert under the NEW spec migrates only overlapping old leaves
    val delta = Seq((1L, ts("2024-01-01 03:00:00"), "a", 11.0))
      .toDF("id", "event_ts", "cat", "amount")
    lake.upsert(delta, "ev", keyCols = Seq("id"), partitionBy = Seq("days(event_ts)"))
    val got = lake.read("ev")
    assert(got.count() === 6)
    assert(got.where(col("id") === 1).head().getDouble(3) === 11.0)
    assert(got.where(col("id") === 2).count() === 1)
  }

  test("hidden specs persist canonically in the catalog and survive a fresh handle") {
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(eventsDf, "ev", partitionBy = Seq("days(event_ts)"))
    lake.registerView("ev", Seq("days( event_ts )")) // sloppy spacing in, canonical out
    import spark.implicits._
    val bdf = (0L until 50L).map(k => (k, s"v$k")).toDF("k", "v")
    lake.createOrReplace(bdf, "bk", partitionBy = Seq("bucket(16, k)"))
    lake.registerView("bk", Seq("bucket(16, k)"))
    val entries = lake.catalogEntries().toMap
    assert(entries("ev") === Seq("days(event_ts)"))
    assert(entries("bk") === Seq("bucket(16,k)")) // comma inside quotes round-trips
    // a FRESH handle re-registers from the catalog and DML keeps the layout
    val lake2 = Lakehouse.openCatalog(spark, root)
    lake2.upsert(Seq((99L, "new")).toDF("k", "v"), "bk",
      keyCols = Seq("k"), partitionBy = lake2.catalogEntries().toMap.apply("bk"))
    assert(lake2.read("bk").count() === 51)
    assert(lake2.dirLayout("bk", lake2.snapshots("bk").last._2
      .map(_.takeWhile(_ != '/')).distinct.sorted.last) === Seq("bucket(16,k)"))
  }

  test("time travel across a hidden-partitioned history stays exact") {
    val lake = new Lakehouse(spark, freshRoot())
    val s1 = lake.createOrReplace(eventsDf.where(col("id") <= 3), "ev",
      partitionBy = Seq("days(event_ts)"))
    lake.append(eventsDf.where(col("id") > 3), "ev", partitionBy = Seq("days(event_ts)"))
    assert(lake.readSnapshot("ev", s1).count() === 3)
    assert(lake.read("ev").count() === 6)
    assert(lake.readSnapshot("ev", s1).columns.forall(!_.startsWith("_p_")))
  }

  test("IN-list predicates prune through range stats and bucket transforms") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    // four disjoint-range files (clustered by construction)
    val df = (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
    lake.createOrReplace(df, "inr")
    val hit = lake.readWhere(col("k").isin(7L, 13L, 42L), "inr")
    assert(hit.collect().map(_.getLong(0)).sorted.toSeq === Seq(7L, 13L, 42L))
    assert(hit.inputFiles.length === 1,
      s"all three keys live in the first range file, read ${hit.inputFiles.length}")
    val two = lake.readWhere(col("k").isin(7L, 399L), "inr")
    assert(two.count() === 2 && two.inputFiles.length === 2)
    // IN maps value-wise through bucket(): only the listed buckets open
    val bdf = (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v").repartition(1)
    lake.createOrReplace(bdf, "inb", partitionBy = Seq("bucket(8,k)"))
    val total = lake.read("inb").inputFiles.length
    val bhit = lake.readWhere(col("k").isin(5L, 6L), "inb")
    assert(bhit.count() === 2)
    assert(bhit.inputFiles.length <= 2 && bhit.inputFiles.length < total,
      s"IN over bucket(8,k) must open at most the 2 listed buckets of $total, " +
        s"opened ${bhit.inputFiles.length}")
  }

  test("write-distribution=hash collapses per-task small files to one per leaf") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    // 8 upstream tasks × 3 days: undistributed → up to 24 files
    val wide = (0L until 240L).map(i =>
      (i, ts(s"2024-01-0${1 + (i % 3)} 0${i % 9}:00:00"), i.toDouble))
      .toDF("id", "event_ts", "amount").repartition(8)
    lake.createOrReplace(wide, "wd_none", partitionBy = Seq("days(event_ts)"))
    val filesNone = lake.read("wd_none").inputFiles.length
    assert(filesNone > 3, s"undistributed write should fan out, got $filesNone files")
    spark.conf.set("spark.graft.write-distribution", "hash")
    try {
      lake.createOrReplace(wide, "wd_hash", partitionBy = Seq("days(event_ts)"))
      val filesHash = lake.read("wd_hash").inputFiles.length
      assert(filesHash === 3, s"hash distribution: one file per day leaf, got $filesHash")
      assert(lake.read("wd_hash").count() === 240)
      spark.conf.set("spark.graft.write-distribution", "range")
      lake.createOrReplace(wide, "wd_range", partitionBy = Seq("days(event_ts)"))
      assert(lake.read("wd_range").count() === 240)
      assert(lake.read("wd_range").inputFiles.length === 3,
        "range distribution also lands one file per leaf")
      intercept[IllegalArgumentException] {
        spark.conf.set("spark.graft.write-distribution", "zorder")
        lake.createOrReplace(wide, "wd_bad", partitionBy = Seq("days(event_ts)"))
      }
    } finally spark.conf.set("spark.graft.write-distribution", "none")
  }

  test("ALTER TABLE SET PARTITION SPEC evolves the layout through SQL") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf, "alt_ev", partitionBy = Seq("days(event_ts)"))
    lake.registerView("alt_ev", Seq("days(event_ts)"))
    spark.sql("ALTER TABLE alt_ev SET PARTITION SPEC (hours(event_ts))")
    // the registry's layout changed: the next parsed INSERT lands hourly
    Seq((8L, ts("2024-05-05 14:30:00"), "e", 80.0))
      .toDF("id", "event_ts", "cat", "amount").createOrReplaceTempView("alt_src")
    spark.sql("INSERT INTO alt_ev SELECT * FROM alt_src")
    val dirs = lake.snapshots("alt_ev").last._2.map(_.takeWhile(_ != '/')).distinct.sorted
    assert(lake.dirLayout("alt_ev", dirs.head) === Seq("days(event_ts)"))
    assert(lake.dirLayout("alt_ev", dirs.last) === Seq("hours(event_ts)"))
    assert(lake.read("alt_ev").count() === 7)
    // multi-entry spec with a comma inside a transform parses too
    spark.sql("ALTER TABLE alt_ev SET PARTITION SPEC (bucket(4, cat), days(event_ts))")
    assert(lake.catalogEntries().toMap.apply("alt_ev") ===
      Seq("bucket(4,cat)", "days(event_ts)"))
    // unknown transforms are rejected at parse time
    intercept[IllegalArgumentException](
      spark.sql("ALTER TABLE alt_ev SET PARTITION SPEC (mod(7,id))"))
  }

  test("t.partitions metadata table reports spec-vocabulary leaves across layouts") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf.where(col("id") <= 3).repartition(1), "pt",
      partitionBy = Seq("days(event_ts)"))
    lake.append(eventsDf.where(col("id") > 3).repartition(1), "pt",
      partitionBy = Seq("cat"))
    lake.registerView("pt", Seq("cat"))
    val parts = spark.sql("SELECT * FROM pt.partitions ORDER BY partition").collect()
    val keys = parts.map(_.getString(0)).toSeq
    // two layouts co-exist: day leaves from data-1, cat leaves from data-2
    assert(keys.count(_.startsWith("days(event_ts)=")) === 2,
      s"ids 1-3 span 2 days, got: $keys")
    assert(keys.count(_.startsWith("cat=")) === 3, s"ids 4-6 span 3 cats, got: $keys")
    assert(parts.map(_.getLong(2)).sum === 6, "record counts come from the footers")
    assert(parts.forall(r => r.getLong(1) >= 1 && r.getLong(3) > 0))
  }

  test("DROP TABLE unregisters; PURGE deletes; plain drop leaves data re-attachable") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(eventsDf, "dr_keep", partitionBy = Seq("days(event_ts)"))
    lake.registerView("dr_keep", Seq("days(event_ts)"))
    lake.createOrReplace(eventsDf, "dr_purge")
    lake.registerView("dr_purge")
    spark.sql("DROP TABLE dr_keep")
    assert(!spark.catalog.tableExists("dr_keep"))
    assert(lake.catalogEntries().toMap.get("dr_keep").isEmpty)
    // data survived a plain drop: re-attach and read
    lake.registerView("dr_keep", Seq("days(event_ts)"))
    assert(spark.sql("SELECT count(*) FROM dr_keep").head().getLong(0) === 6)
    spark.sql("DROP TABLE dr_purge PURGE")
    assert(!new java.io.File(s"$root/dr_purge").exists, "PURGE removes the table dir")
  }

  test("CREATE TABLE AS through SQL with a session default lake and hidden specs") {
    import spark.implicits._
    val root = freshRoot()
    eventsDf.createOrReplaceTempView("ctas_src")
    spark.conf.set("spark.graft.lake-root", root)
    try {
      spark.sql(
        """CREATE TABLE ct_ev PARTITIONED BY (days(event_ts))
          |AS SELECT * FROM ctas_src WHERE id <= 4""".stripMargin)
      val lake = new Lakehouse(spark, root)
      assert(lake.read("ct_ev").count() === 4)
      assert(lake.dirLayout("ct_ev", "data-1") === Seq("days(event_ts)"))
      // registered: parsed DML + metadata tables work immediately
      spark.sql("INSERT INTO ct_ev SELECT * FROM ctas_src WHERE id > 4")
      assert(spark.sql("SELECT count(*) FROM ct_ev").head().getLong(0) === 6)
      // plain CREATE refuses an existing table; OR REPLACE commits v2
      intercept[IllegalStateException](
        spark.sql("CREATE TABLE ct_ev AS SELECT * FROM ctas_src"))
      spark.sql("CREATE OR REPLACE TABLE ct_ev AS SELECT * FROM ctas_src WHERE id = 1")
      assert(lake.read("ct_ev").count() === 1)
      assert(lake.snapshots("ct_ev").size >= 3, "replace keeps travelable history")
    } finally spark.conf.unset("spark.graft.lake-root")
    // without the default-lake conf, CTAS falls through to Spark's own
    // parser (a managed spark-warehouse table, not a lakehouse one)
    spark.sql("DROP TABLE IF EXISTS plain_ct")
    val warehouseLeft = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "plain_ct")
    if (warehouseLeft.exists)
      org.apache.commons.io.FileUtils.deleteDirectory(warehouseLeft)
    spark.sql("CREATE TABLE plain_ct AS SELECT * FROM ctas_src")
    try {
      assert(new Lakehouse(spark, root).currentSnapshot("plain_ct").isEmpty,
        "no-conf CTAS must not route to the lakehouse")
    } finally spark.sql("DROP TABLE IF EXISTS plain_ct")
  }

  test("compaction folds an append chain and keeps the hidden layout + pruning") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(eventsDf.where(col("id") <= 2), "cp",
      partitionBy = Seq("days(event_ts)"))
    lake.append(eventsDf.where(col("id") > 2 && col("id") <= 4), "cp",
      partitionBy = Seq("days(event_ts)"))
    lake.append(eventsDf.where(col("id") > 4), "cp", partitionBy = Seq("days(event_ts)"))
    lake.compact("cp", partitionBy = Seq("days(event_ts)"))
    val entries = lake.snapshots("cp").last._2
    assert(entries.map(_.takeWhile(_ != '/')).distinct.size === 1,
      s"compaction folds to one data dir, got $entries")
    assert(lake.dirLayout("cp", entries.head.takeWhile(_ != '/')) === Seq("days(event_ts)"))
    assert(lake.read("cp").count() === 6)
    assert(lake.read("cp").columns.forall(!_.startsWith("_p_")))
    // pruning still rides the compacted dir's leaves
    val recent = lake.readWhere(col("event_ts") >= lit(ts("2025-01-01 00:00:00")), "cp")
    assert(recent.count() === 1)
    assert(recent.inputFiles.length < lake.read("cp").inputFiles.length)
  }

  test("VACUUM through SQL expires history and removes unreferenced dirs") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "vc")
    lake.createOrReplace(Seq((2L, "b")).toDF("k", "v"), "vc") // orphans data-1
    lake.append(Seq((3L, "c")).toDF("k", "v"), "vc")
    lake.registerView("vc")
    assert(lake.snapshots("vc").size === 3)
    val expired = spark.sql("VACUUM vc RETAIN 1 SNAPSHOTS").head().getLong(0)
    assert(expired === 2L, "two historical snapshots expire")
    assert(lake.snapshots("vc").map(_._1) === Seq(3L))
    assert(lake.read("vc").collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    // v1's dir is physically gone (expiry collects unreferenced dirs)
    assert(!new java.io.File(s"$root/vc/data-1").exists)
    // default retains 1; idempotent re-run expires nothing further
    assert(spark.sql("VACUUM vc").head().getLong(0) === 0L)
  }

  test("transform exprs and literal mappings agree on randomized inputs (pruning soundness)") {
    import spark.implicits._
    // If the Column expression (write side) and the literal mapping
    // (prune side) ever disagree on one value, stats pruning silently
    // drops matching files — this is the invariant everything rests on.
    val rnd = new scala.util.Random(42)
    val micros = Seq.fill(200)(
      // ±55 years around epoch, microsecond precision
      (rnd.nextLong() % (55L * 365 * 86400 * 1000000L))) :+ 0L :+ -1L :+ 86399999999L
    val tsDf = micros.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("id", "us")
      .select(col("id"), expr("timestamp_micros(us)").as("t"), col("us"))
    for (spec <- Seq("days(t)", "months(t)", "years(t)", "hours(t)")) {
      val t = Transforms.parse(spec)
      val got = t.expr(tsDf)
      val rows = tsDf.select(col("us"), got.as("derived")).collect()
      rows.foreach { r =>
        val want = t.derivedConjunct("=", Transforms.TsMicros(r.getLong(0))).get._3
        assert(r.getLong(1) === want,
          s"$spec: expr=${r.getLong(1)} literal=$want for micros=${r.getLong(0)}")
      }
    }
    // dates
    val days = Seq.fill(100)(rnd.nextInt(40000) - 20000) :+ 0 :+ -1
    val dDf = days.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "ds")
      .select(col("id"), expr("date_add(DATE'1970-01-01', ds)").as("d"), col("ds"))
    for (spec <- Seq("days(d)", "months(d)", "years(d)", "bucket(7,d)")) {
      val t = Transforms.parse(spec)
      val rows = dDf.select(col("ds"), t.expr(dDf).as("derived")).collect()
      rows.foreach { r =>
        val want = t.derivedConjunct("=", Transforms.DateDays(r.getInt(0))).get._3
        assert(r.getLong(1) === want, s"$spec mismatch at days=${r.getInt(0)}")
      }
    }
    // integral + string truncate and bucket
    val longs = Seq.fill(100)(rnd.nextLong() % 100000L)
    val lDf = longs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "k")
    for (spec <- Seq("truncate(10,k)", "truncate(7,k)", "bucket(16,k)")) {
      val t = Transforms.parse(spec)
      val rows = lDf.select(col("k"), t.expr(lDf).as("derived")).collect()
      rows.foreach { r =>
        val want = t.derivedConjunct("=", r.getLong(0)).get._3
        assert(r.getLong(1) === want, s"$spec mismatch at k=${r.getLong(0)}")
      }
    }
    // supplementary characters (surrogate pairs): the literal-side
    // prefix must count CODE POINTS like Spark's substring, or a leaf
    // holding matching rows could be pruned
    val strs = Seq("", "a", "Ab", "hello world", "ünïcode", "zzzz",
      "😀ab", "a😀b😁c", "😀😁😂xy")
    val sDf = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (spec <- Seq("truncate(3,s)", "bucket(8,s)")) {
      val t = Transforms.parse(spec)
      val rows = sDf.select(col("s"), t.expr(sDf).as("derived")).collect()
      rows.foreach { r =>
        val want = t.derivedConjunct("=", r.getString(0)).get._3
        assert(r.get(1) === want, s"$spec mismatch at s='${r.getString(0)}'")
      }
    }
  }

  test("null source values land in the default partition and round-trip through DML") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val df = Seq(
      (1L, Some(ts("2024-01-01 03:00:00")), 1.0),
      (2L, None, 2.0),
      (3L, Some(ts("2024-01-02 08:00:00")), 3.0)
    ).map { case (id, t, a) => (id, t.orNull, a) }.toDF("id", "event_ts", "amount")
    lake.createOrReplace(df, "nl", partitionBy = Seq("days(event_ts)"))
    val got = lake.read("nl")
    assert(got.count() === 3)
    assert(got.where(col("event_ts").isNull).collect().map(_.getLong(0)).toSeq === Seq(2L))
    // a time-range read never returns the null row, and pruning stays sound
    val ranged = lake.readWhere(col("event_ts") >= lit(ts("2024-01-02 00:00:00")), "nl")
    assert(ranged.collect().map(_.getLong(0)).toSeq === Seq(3L))
    // DML over the mixed table keeps the null row intact
    lake.updateWhere(Seq("amount" -> (col("amount") + 10)), col("id") === 2L, "nl",
      partitionBy = Seq("days(event_ts)"))
    val r2 = lake.read("nl").where(col("id") === 2L).head()
    assert(r2.isNullAt(1) && r2.getDouble(2) === 12.0)
  }

  test("transform parsing: canonical forms, round-trips, and rejects") {
    assert(Transforms.parse("days(ts)").phys === "_p_days_ts")
    assert(Transforms.parse("bucket( 8 , k )").spec === "bucket(8,k)")
    assert(Transforms.specOfPhys("_p_trunc_4_name") === "truncate(4,name)")
    assert(Transforms.specOfPhys("_p_bucket_16_k") === "bucket(16,k)")
    assert(Transforms.specOfPhys("plain_col") === "plain_col")
    assert(Transforms.parsePhys("_p_months_d").spec === "months(d)")
    intercept[IllegalArgumentException](Transforms.parse("mod(7,k)"))
    intercept[IllegalArgumentException](Transforms.parse("bucket(0,k)"))
  }

  test("t.partition_stats reports per-partition value ranges from the ledgers") {
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(eventsDf, "evs", partitionBy = Seq("days(event_ts)"))
    lake.registerView("evs", Seq("days(event_ts)"))
    val stats = lake.partitionStatsDf("evs").collect()
    assert(stats.nonEmpty)
    // partitions report in SPEC vocabulary and ranges sit inside them
    val amount = stats.filter(_.getAs[String]("col") == "amount")
    assert(amount.forall(_.getAs[String]("partition").startsWith("days(event_ts)=")))
    // each single-row day leaf has lo == hi == its amount
    val day1 = amount.find(_.getAs[String]("partition")
      .contains((java.time.LocalDate.of(2024, 1, 2).toEpochDay).toString))
    assert(day1.isDefined)
    assert(BigDecimal(day1.get.getAs[String]("lo")) === BigDecimal(30.0))
    assert(BigDecimal(day1.get.getAs[String]("hi")) === BigDecimal(30.0))
    // the 2-row day leaf spans both its values
    val day0 = amount.find(_.getAs[String]("partition")
      .contains((java.time.LocalDate.of(2024, 1, 1).toEpochDay).toString)).get
    assert(BigDecimal(day0.getAs[String]("lo")) === BigDecimal(10.0) &&
      BigDecimal(day0.getAs[String]("hi")) === BigDecimal(20.0))
    // reachable through the SQL meta-table surface too
    val viaSql = spark.sql(
      "SELECT count(*) FROM evs.partition_stats WHERE col = 'amount'").head().getLong(0)
    assert(viaSql === amount.length.toLong)
  }

  test("bucket() rejects timestamp sources (session-TZ-dependent cast)") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("id", "t")
    // a TIMESTAMP's cast-to-string follows the session timezone: two
    // writers in different zones would hash the same row into
    // different buckets, so the transform must refuse at write time
    val e = intercept[IllegalArgumentException](
      Transforms.parse("bucket(8,t)").expr(df))
    assert(e.getMessage.contains("bucket()"))
    intercept[IllegalArgumentException](
      new Lakehouse(spark, freshRoot()).createOrReplace(df, "bt",
        partitionBy = Seq("bucket(8,t)")))
  }
}
