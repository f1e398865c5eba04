package graft

import org.apache.spark.sql.functions._

import graft.sources.Lakehouse

/** `CALL system.<proc>(…)` — the Iceberg maintenance-procedure surface
  * (rewrite_data_files / expire_snapshots / remove_orphan_files /
  * rollback_to_snapshot) parsed into snapshot-committing lakehouse
  * calls, positional or `name => value` arguments. */
class CallProcedureSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-call").toString

  test("rewrite_data_files binpack folds an append chain; data and history survive") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "rw")
    (2L to 5L).foreach(i => lake.append(Seq((i, "x")).toDF("k", "v"), "rw"))
    lake.registerView("rw")
    val r = spark.sql("CALL system.rewrite_data_files('rw')").head()
    assert(r.getLong(1) > r.getLong(2), "binpack must shrink the file count")
    assert(spark.sql("SELECT count(*) AS n FROM rw").head().getLong(0) === 5)
    // the pre-compaction snapshot stays travel-readable
    assert(lake.readSnapshot("rw", 1L).count() === 1)
  }

  test("rewrite_position_deletes: equality tombstones convert to positional; DROP COLUMN unblocks, reads row-equal (r14)") {
    import spark.implicits._
    val rootDir = freshRoot()
    val lake = new Lakehouse(spark, rootDir)
    lake.createOrReplace(
      (1L to 30L).map(k => (k, k * 10, s"v$k")).toDF("k", "u", "v"),
      "rpd", Seq("bucket(4,k)"))
    lake.registerView("rpd", Seq("bucket(4,k)"))
    lake.deleteByKeyMor(Seq(50L, 170L).toDF("u"), "rpd") // keyed on u
    // a later append RE-INSERTS a deleted key — the equality tombstone
    // must not reach it, and neither may the converted positions
    lake.append(Seq((31L, 50L, "back")).toDF("k", "u", "v"), "rpd", Seq("bucket(4,k)"))
    val expect = lake.read("rpd").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    assert(expect.length === 29) // 30 - 2 + 1 re-insert
    // the live equality tombstone blocks dropping its key column
    val e = intercept[Exception](lake.dropColumn("rpd", "u"))
    assert(e.getMessage.contains("equality tombstone"))
    val r = spark.sql("CALL system.rewrite_position_deletes('rpd')").head()
    assert(r.getLong(1) === 1L, "one equality tombstone must convert")
    // reads are bit-identical after the conversion, re-insert intact
    val got = lake.read("rpd").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    assert(got === expect, "conversion must not move a single row")
    assert(lake.read("rpd").where(col("u") === 50L).count() === 1,
      "the re-inserted key must survive the converted positions")
    // positions are name-free: the DROP now lands, rows still served
    lake.dropColumn("rpd", "u")
    assert(lake.read("rpd").columns.toSeq === Seq("k", "v"))
    assert(lake.read("rpd").count() === 29)
    // the SPJ path serves the converted table too
    spark.conf.set("spark.sql.catalog.call_rpd",
      classOf[graft.sources.spj.GraftSpjCatalog].getName)
    spark.conf.set("spark.sql.catalog.call_rpd.root", rootDir)
    assert(spark.table("call_rpd.rpd").count() === 29)
    // idempotence: nothing equality-shaped left — a second call no-ops
    val snaps = lake.snapshots("rpd").length
    spark.sql("CALL system.rewrite_position_deletes('rpd')").head()
    assert(lake.snapshots("rpd").length === snaps)
  }

  test("rewrite_position_deletes: MANY equality tombstones convert in bounded union groups (r15)") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    // 8 data dirs × 12 equality tombstones = 96 semi-join branches —
    // enough to exercise three RewriteUnionBranches(=32) write groups
    lake.createOrReplace((1L to 25L).map(k => (k, s"v$k")).toDF("k", "v"), "rpm")
    lake.registerView("rpm")
    (1 to 7).foreach { i =>
      lake.append(((i * 25 + 1L) to (i * 25 + 25L)).map(k => (k, s"v$k"))
        .toDF("k", "v"), "rpm")
    }
    // 12 separate MoR deletes, each keying a distinct stripe
    (0 until 12).foreach { i =>
      lake.deleteByKeyMor(Seq(i * 16 + 1L, i * 16 + 2L).toDF("k"), "rpm")
    }
    val expect = lake.read("rpm").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    assert(expect.length === 200 - 24)
    val r = spark.sql("CALL system.rewrite_position_deletes('rpm')").head()
    assert(r.getLong(1) === 12L, "all twelve equality tombstones must convert")
    val got = lake.read("rpm").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    assert(got === expect, "grouped conversion must not move a single row")
    // exactly one positional tombstone replaced the twelve
    val snap = lake.currentSnapshot("rpm").get
    assert(lake.snapshotDeletes("rpm").getOrElse(snap, Seq.empty).length === 1)
  }

  test("rewrite_data_files sort clusters on explicit or declared sort order") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val df = spark.range(1000).select(
      (col("id") * 37 % 1000).as("k"), col("id").as("v"))
    lake.createOrReplace(df, "rs")
    lake.registerView("rs")
    val r = spark.sql(
      "CALL system.rewrite_data_files(table => 'rs', strategy => 'sort', " +
        "sort_order => 'k', file_count => 4)").head()
    assert(r.getLong(2) <= 4L)
    assert(spark.sql("SELECT count(*) AS n FROM rs").head().getLong(0) === 1000)
    // clustered files carry tight disjoint k ranges: a point lookup
    // opens exactly one file
    val hit = lake.readWhere(col("k") === 500, "rs")
    assert(hit.count() === 1)
    assert(hit.inputFiles.length === 1,
      s"expected 1 file after sort clustering, opened ${hit.inputFiles.length}")
    // declared write sort order is the fallback when sort_order is omitted
    lake.declareSortOrder("rs", Seq("k"))
    val r2 = spark.sql(
      "CALL system.rewrite_data_files('rs', 'sort', file_count => 2)").head()
    assert(r2.getLong(2) <= 2L)
  }

  test("rewrite_data_files zorder + full; bad strategy refused") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val df = spark.range(256).select(
      (col("id") % 16).as("a"), (col("id") / 16).as("b"), col("id").as("v"))
    lake.createOrReplace(df, "rz")
    lake.registerView("rz")
    spark.sql("CALL system.rewrite_data_files('rz', 'zorder', 'a,b', 4)").collect()
    assert(spark.sql("SELECT count(*) AS n FROM rz").head().getLong(0) === 256)
    spark.sql("CALL system.rewrite_data_files('rz', 'full')").collect()
    assert(spark.sql("SELECT sum(v) AS s FROM rz").head().getLong(0) === 255L * 256 / 2)
    val e = intercept[Exception](
      spark.sql("CALL system.rewrite_data_files('rz', 'shuffle')").collect())
    assert(e.getMessage.contains("binpack|sort|zorder|full"))
  }

  test("expire_snapshots truncates history; rollback_to_snapshot moves the pointer back") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "ex")
    lake.registerView("ex")
    spark.sql("INSERT INTO ex SELECT 2, 'b'")
    spark.sql("INSERT INTO ex SELECT 3, 'c'")
    // roll back past the last insert: the view refreshes to the old state
    val back = spark.sql(
      "CALL system.rollback_to_snapshot('ex', 2)").head()
    assert(back.getLong(0) === 3L && back.getLong(1) === 2L)
    assert(spark.sql("SELECT count(*) AS n FROM ex").head().getLong(0) === 2)
    // roll forward again (any committed snapshot is addressable)
    spark.sql("CALL system.rollback_to_snapshot('ex', snapshot_id => 3)")
    assert(spark.sql("SELECT count(*) AS n FROM ex").head().getLong(0) === 3)
    val exp = spark.sql(
      "CALL system.expire_snapshots('ex', retain_last => 2)").head()
    assert(exp.getLong(0) === 1L && exp.getLong(1) === 2L)
    assert(lake.snapshots("ex").map(_._1) === Seq(2L, 3L))
  }

  test("remove_orphan_files reaps a dead writer's dir; fresh dirs survive the default grace") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "or")
    lake.registerView("or")
    // an IN-FLIGHT writer: unreferenced dir + live _reserve marker —
    // the marker shields it from the sweep regardless of the grace
    val dead = new java.io.File(lake.tableRoot("or").toString, "data-99")
    assert(dead.mkdirs())
    val marker = new java.io.File(lake.tableRoot("or").toString, "_reserve-99")
    assert(marker.createNewFile())
    assert(spark.sql("CALL system.remove_orphan_files('or')").count() === 0)
    assert(dead.exists(), "a live reservation marker must shield the dir")
    // grace 0: the marker is stale (the writer is dead) — marker and
    // dir both reap
    val got = spark.sql(
      "CALL system.remove_orphan_files('or', older_than_ms => 0)").collect()
    assert(got.map(_.getString(0)).toSet === Set("_reserve-99", "data-99"))
    assert(!dead.exists() && !marker.exists())
    assert(spark.sql("SELECT count(*) AS n FROM or").head().getLong(0) === 1)
  }

  test("procedures act on the session branch; main is untouched") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val v1 = lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "br")
    lake.registerView("br")
    lake.createBranch("br", "etl", v1)
    spark.conf.set("spark.graft.branch", "etl")
    try {
      spark.sql("INSERT INTO br SELECT 2, 'b'")
      spark.sql("INSERT INTO br SELECT 3, 'c'")
      spark.sql("CALL system.rollback_to_snapshot('br', 2)")
      assert(spark.sql("SELECT count(*) AS n FROM br").head().getLong(0) === 2)
    } finally spark.conf.unset("spark.graft.branch")
    assert(lake.currentSnapshot("br", "main") === Some(v1))
    assert(lake.read("br", "main").count() === 1)
  }

  test("sql_maintenance lifecycle: compact state identical, rollback readout, expiry keeps data") {
    val got = graft.operators.Medallion.sqlMaintenance(spark, sf).collect()
    assert(got.length === 3)
    val byAt = got.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byAt("after_compact") === byAt("final"),
      "expiry after roll-forward must preserve the compacted state")
    assert(byAt("after_rollback")._1 < byAt("after_compact")._1,
      "rollback must drop the last insert's rows")
  }

  test("refusals: unknown procedure, unknown parameter, unregistered table delegates") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "rf")
    lake.registerView("rf")
    val e1 = intercept[Exception](
      spark.sql("CALL system.defragment('rf')").collect())
    assert(e1.getMessage.contains("unknown procedure"))
    val e2 = intercept[Exception](
      spark.sql("CALL system.expire_snapshots('rf', keep => 2)").collect())
    assert(e2.getMessage.contains("no parameter"))
    // a CALL naming no registered view falls through to Spark's parser
    intercept[Exception](
      spark.sql("CALL system.rewrite_data_files('not_a_view')").collect())
  }
}
