package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Medallion
import graft.sources.Lakehouse
import graft.sources.spj.GraftSpjCatalog

/** DDL through the DSv2 catalog ([[GraftSpjCatalog.createTable]]):
  * CREATE TABLE / CTAS / DROP TABLE land as lakehouse snapshots +
  * durable catalog lines, empty tables load immediately under their
  * declared spec, and unservable declarations refuse at CREATE time. */
class SpjDdlSpec extends SparkSpec {

  private def withSpj[T](root: String, cat: String)(body: => T): T = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("CREATE TABLE + INSERT INTO: the empty table loads under its declared spec, then SPJ-serves") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-c").toString
    withSpj(root, "ddl1") {
      spark.sql("CREATE TABLE ddl1.t1 (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
      // empty but immediately readable — the declared-spec fallback —
      // and SHOW TABLES advertises it
      assert(spark.table("ddl1.t1").count() === 0L)
      assert(spark.sql("SHOW TABLES IN ddl1").collect().map(_.getString(1)).contains("t1"))
      import spark.implicits._
      (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
        .createOrReplaceTempView("ddl1_src")
      spark.sql("INSERT INTO ddl1.t1 SELECT k, v FROM ddl1_src")
      spark.sql("INSERT INTO ddl1.t1 VALUES (21, 'v21')")
      assert(spark.table("ddl1.t1").count() === 21L)
      // the created layout SPJ-serves: same-spec join plans no Exchange
      spark.sql("CREATE TABLE ddl1.t2 (k2 BIGINT, w DOUBLE) PARTITIONED BY (bucket(4, k2))")
      spark.sql("INSERT INTO ddl1.t2 SELECT k, k * 1.5 FROM ddl1_src")
      val j = spark.table("ddl1.t1").join(spark.table("ddl1.t2"), col("k") === col("k2"))
      assert(!Medallion.plansShuffle(j), "created tables must co-locate:\n" +
        j.queryExecution.executedPlan)
      assert(j.count() === 20L)
      // and the full DML surface works on a created table
      spark.sql("UPDATE ddl1.t1 SET v = 'X' WHERE k = 7")
      assert(sortedRows(spark.table("ddl1.t1").where(col("k") === 7)) === Seq("7|X"))
    }
  }

  test("CTAS: CREATE TABLE ... PARTITIONED BY ... AS SELECT lands the rows under the layout") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-s").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val src = (1L to 30L).map(k => (k, if (k % 2 == 0) "E" else "O")).toDF("k", "tag")
    src.createOrReplaceTempView("ddl2_src")
    withSpj(root, "ddl2") {
      spark.sql(
        "CREATE TABLE ddl2.ct PARTITIONED BY (bucket(4, k)) AS SELECT k, tag FROM ddl2_src")
      assert(sortedRows(spark.table("ddl2.ct")) === sortedRows(src))
      // the layout is real: the lakehouse side sees a bucket(4,k) spec
      assert(lake.spjLayout("ct").spec === Seq("bucket(4,k)"))
      // two-level identity x bucket CTAS too
      spark.sql(
        "CREATE TABLE ddl2.ct2 PARTITIONED BY (tag, bucket(2, k)) AS SELECT k, tag FROM ddl2_src")
      assert(sortedRows(spark.table("ddl2.ct2")) === sortedRows(src))
      assert(lake.spjLayout("ct2").spec === Seq("tag", "bucket(2,k)"))
    }
  }

  test("unservable or malformed declarations refuse at CREATE time") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-r").toString
    withSpj(root, "ddl3") {
      // calendar transform alone is not a servable SPJ shape
      val e1 = intercept[Exception] {
        spark.sql("CREATE TABLE ddl3.bad1 (ts TIMESTAMP, v STRING) PARTITIONED BY (days(ts))")
      }
      assert(e1.getMessage.contains("unservable") || e1.getMessage.contains("serves"))
      // unknown transform
      intercept[Exception] {
        spark.sql("CREATE TABLE ddl3.bad2 (k BIGINT) PARTITIONED BY (truncate(3, k))")
      }
      // unpartitioned
      intercept[Exception] {
        spark.sql("CREATE TABLE ddl3.bad3 (k BIGINT)")
      }
      // duplicate create
      spark.sql("CREATE TABLE ddl3.ok (k BIGINT) PARTITIONED BY (bucket(2, k))")
      intercept[Exception] {
        spark.sql("CREATE TABLE ddl3.ok (k BIGINT) PARTITIONED BY (bucket(2, k))")
      }
      // and none of the refusals left half-created state
      val lake = new Lakehouse(spark, root)
      assert(!lake.tableNames().exists(_.startsWith("bad")))
    }
  }

  test("TRUNCATE TABLE empties the table; it stays servable and re-insertable") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-t").toString
    withSpj(root, "ddl5") {
      spark.sql("CREATE TABLE ddl5.tr (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO ddl5.tr VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      spark.sql("TRUNCATE TABLE ddl5.tr")
      assert(spark.table("ddl5.tr").count() === 0L,
        "truncate must empty the table")
      // the emptied table still serves under its declared spec — the
      // zero-row marker machinery — and takes fresh inserts
      spark.sql("INSERT INTO ddl5.tr VALUES (9, 'z')")
      assert(sortedRows(spark.table("ddl5.tr")) === Seq("9|z"))
      // history time-travels to the pre-truncate state
      val lake = new Lakehouse(spark, root)
      val snaps = lake.snapshots("tr").map(_._1).sorted
      assert(lake.readSnapshot("tr", snaps(1)).count() === 3L)
    }
  }

  test("DROP TABLE removes the table and its data (managed semantics)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-d").toString
    withSpj(root, "ddl4") {
      spark.sql("CREATE TABLE ddl4.dropme (k BIGINT) PARTITIONED BY (bucket(2, k))")
      spark.sql("INSERT INTO ddl4.dropme VALUES (1), (2), (3)")
      assert(spark.table("ddl4.dropme").count() === 3L)
      spark.sql("DROP TABLE ddl4.dropme")
      val lake = new Lakehouse(spark, root)
      assert(!lake.tableNames().contains("dropme"))
      intercept[Exception] { spark.table("ddl4.dropme").count() }
      // DROP of a missing table through IF EXISTS is a no-op
      spark.sql("DROP TABLE IF EXISTS ddl4.dropme")
    }
  }

  test("multi-change ALTER commits ONE grouped snapshot; a failing change applies NOTHING (r14)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-g").toString
    val lake = new Lakehouse(spark, root)
    withSpj(root, "ddl7") {
      spark.sql("CREATE TABLE ddl7.gt (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO ddl7.gt VALUES (1, 'a'), (2, 'b')")
      val before = lake.snapshots("gt").length
      // TWO changes in one statement (Spark's grammar groups multiple
      // columns under one ADD COLUMNS) — exactly ONE history line
      spark.sql("ALTER TABLE ddl7.gt ADD COLUMNS (n INT, weight DOUBLE)")
      assert(lake.snapshots("gt").length === before + 1,
        "a multi-change ALTER must commit exactly one grouped snapshot")
      // MIXED-kind grouping through the API the catalog rides: add +
      // rename-of-the-just-added + widen, one snapshot, later steps
      // validating against the intermediate schema
      val at = lake.snapshots("gt").length
      lake.alterSchemaGrouped("gt", Seq(
        lake.addColumnsStep("gt", org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("tag0",
            org.apache.spark.sql.types.StringType)))),
        lake.renameColumnStep("gt", "tag0", "tag"),
        lake.alterColumnTypeStep("gt", "n", org.apache.spark.sql.types.LongType)))
      assert(lake.snapshots("gt").length === at + 1,
        "a mixed-kind grouped ALTER must commit exactly one snapshot")
      assert(spark.table("ddl7.gt").schema.fieldNames.toSeq ===
        Seq("k", "v", "n", "weight", "tag"))
      assert(spark.table("ddl7.gt").schema("n").dataType ===
        org.apache.spark.sql.types.LongType)
      // atomicity: a failing later change leaves NOTHING applied — no
      // snapshot, no schema movement (the torn window Iceberg's grouped
      // commit closes). `v` already exists, so the second ADD refuses.
      val snaps = lake.snapshots("gt").length
      intercept[Exception](spark.sql(
        "ALTER TABLE ddl7.gt ADD COLUMNS (ok STRING, v DOUBLE)"))
      assert(lake.snapshots("gt").length === snaps,
        "a failed grouped ALTER must commit nothing")
      assert(!spark.table("ddl7.gt").schema.fieldNames.contains("ok"),
        "the earlier change of a failed grouped ALTER must not survive")
      // rows still serve under the final schema
      assert(sortedRows(spark.table("ddl7.gt").select("k", "v")) ===
        Seq("1|a", "2|b"))
    }
  }

  test("column positions: ADD COLUMNS FIRST/AFTER and ALTER COLUMN AFTER reorder as metadata (r14)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-pos").toString
    val lake = new Lakehouse(spark, root)
    withSpj(root, "ddl9") {
      spark.sql("CREATE TABLE ddl9.pt (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO ddl9.pt VALUES (1, 'a'), (2, 'b')")
      val preOrder = lake.currentSnapshot("pt").get
      // ADD ... FIRST: one grouped snapshot (add + move), old dirs
      // conform by name — their rows read NULL in the new slot
      val before = lake.snapshots("pt").length
      spark.sql("ALTER TABLE ddl9.pt ADD COLUMNS (w DOUBLE FIRST)")
      assert(lake.snapshots("pt").length === before + 1,
        "ADD ... FIRST must commit one grouped snapshot")
      assert(spark.table("ddl9.pt").schema.fieldNames.toSeq === Seq("w", "k", "v"))
      assert(sortedRows(spark.table("ddl9.pt")) === Seq("null|1|a", "null|2|b"))
      // pure reorder: ALTER COLUMN ... AFTER
      spark.sql("ALTER TABLE ddl9.pt ALTER COLUMN w AFTER k")
      assert(spark.table("ddl9.pt").schema.fieldNames.toSeq === Seq("k", "w", "v"))
      // positional INSERT follows the NEW declared order (SQL contract)
      spark.sql("INSERT INTO ddl9.pt VALUES (3, 2.5, 'c')")
      assert(sortedRows(spark.table("ddl9.pt")) ===
        Seq("1|null|a", "2|null|b", "3|2.5|c"))
      // both read paths agree over the mixed physical orders
      assert(sortedRows(spark.table("ddl9.pt")) === sortedRows(lake.read("pt")))
      // time travel below the reorder sees the ORIGINAL order
      assert(lake.readSnapshot("pt", preOrder).schema.fieldNames.toSeq ===
        Seq("k", "v"))
      // DML keeps serving (the reorder is invisible to name-based ops)
      spark.sql("UPDATE ddl9.pt SET w = 9.0 WHERE k = 1")
      assert(spark.table("ddl9.pt").where(col("k") === 1)
        .select("w").collect().head.getDouble(0) === 9.0)
      assert(sortedRows(spark.table("ddl9.pt")) === sortedRows(lake.read("pt")))
      // moving after a missing column refuses; nothing applied
      val snaps = lake.snapshots("pt").length
      intercept[Exception](spark.sql("ALTER TABLE ddl9.pt ALTER COLUMN w AFTER nope"))
      assert(lake.snapshots("pt").length === snaps)
    }
  }

  test("ALTER TABLE cat.t RENAME TO moves the table: history, layout and catalog line travel (r14)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-r").toString
    val lake = new Lakehouse(spark, root)
    withSpj(root, "ddl8") {
      spark.sql("CREATE TABLE ddl8.rn_a (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO ddl8.rn_a VALUES (1, 'x'), (2, 'y'), (3, 'z')")
      spark.sql("DELETE FROM ddl8.rn_a WHERE k = 2")
      val history = lake.snapshots("rn_a").length
      spark.sql("ALTER TABLE ddl8.rn_a RENAME TO rn_b")
      // the old name stops resolving, the new one serves with FULL
      // history and the same layout claims
      intercept[Exception](spark.table("ddl8.rn_a").count())
      assert(sortedRows(spark.table("ddl8.rn_b")) === Seq("1|x", "3|z"))
      assert(lake.snapshots("rn_b").length === history)
      assert(!spark.sql("SHOW TABLES IN ddl8").collect().map(_.getString(1)).contains("rn_a"))
      assert(spark.sql("SHOW TABLES IN ddl8").collect().map(_.getString(1)).contains("rn_b"))
      // the catalog line re-keyed: a fresh session handle sees the
      // declared layout under the NEW name (durable re-registration)
      assert(lake.catalogEntries().exists { case (t, spec) =>
        t == "rn_b" && spec == Seq("bucket(4,k)") })
      assert(!lake.catalogEntries().exists(_._1 == "rn_a"))
      // DML keeps working against the moved table
      spark.sql("INSERT INTO ddl8.rn_b VALUES (4, 'w')")
      assert(spark.table("ddl8.rn_b").count() === 3)
      // renaming onto an existing name refuses
      spark.sql("CREATE TABLE ddl8.rn_c (k BIGINT) PARTITIONED BY (bucket(2, k))")
      intercept[Exception](spark.sql("ALTER TABLE ddl8.rn_b RENAME TO rn_c"))
    }
  }

  test("SHOW CREATE TABLE round-trips: the emitted statements rebuild an equivalent table (r16)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-sc").toString
    val lake = new Lakehouse(spark, root)
    withSpj(root, "ddlsc") {
      spark.sql("CREATE TABLE ddlsc.sct (k BIGINT, v STRING, " +
        "addr STRUCT<city: STRING, zip: BIGINT>) PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO ddlsc.sct VALUES (1, 'a', named_struct('city', 'NYC', 'zip', 10001L))")
      // evolve: top-level DEFAULT add, rename, nested add — the
      // readout must reflect the CURRENT declared state
      spark.sql("ALTER TABLE ddlsc.sct ADD COLUMNS (tier STRING DEFAULT 'basic')")
      spark.sql("ALTER TABLE ddlsc.sct RENAME COLUMN v TO label")
      spark.sql("ALTER TABLE ddlsc.sct ADD COLUMNS (addr.country STRING)")
      // auxiliary declarations land through the new CALLs
      lake.registerView("sct", Seq("bucket(4,k)"))
      spark.sql("CALL system.set_sort_order('sct', 'k')")
      spark.sql("CALL system.set_bloom_columns('sct', 'label')")
      val stmts = spark.sql("SHOW CREATE TABLE sct").collect().map(_.getString(0))
      assert(stmts.length === 3, s"CREATE + two CALLs expected: ${stmts.mkString(" | ")}")
      assert(stmts(0).contains("tier STRING DEFAULT 'basic'"), stmts(0))
      assert(stmts(0).contains("label STRING") && !stmts(0).contains(" v STRING"), stmts(0))
      assert(stmts(0).contains("country"), stmts(0))
      assert(stmts(0).contains("PARTITIONED BY (bucket(4,k))"), stmts(0))
      // REBUILD from the emitted script in a fresh root under a new name
      val root2 = java.nio.file.Files.createTempDirectory("graft-ddl-sc2").toString
      val lake2 = new Lakehouse(spark, root2)
      spark.conf.set("spark.sql.catalog.ddlsc2", classOf[GraftSpjCatalog].getName)
      spark.conf.set("spark.sql.catalog.ddlsc2.root", root2)
      val rebuilt = stmts.map(_.replace("sct", "sct2"))
      spark.sql(rebuilt(0).replaceFirst("CREATE TABLE sct2", "CREATE TABLE ddlsc2.sct2"))
      lake2.registerView("sct2", Seq("bucket(4,k)"))
      rebuilt.drop(1).foreach(spark.sql(_))
      // equivalence: the rebuilt table's own readout matches modulo name
      assert(lake2.showCreateStatements("sct2").map(_.replace("sct2", "sct")) ===
        lake.showCreateStatements("sct").toSeq)
      // the DEFAULT is live on the rebuilt table
      spark.sql("INSERT INTO ddlsc2.sct2 (k, label, addr) VALUES " +
        "(9, 'z', named_struct('city', 'SF', 'zip', 94105L, 'country', 'US'))")
      assert(spark.table("ddlsc2.sct2").where(col("k") === 9L)
        .head().getAs[String]("tier") === "basic")
      // DESCRIBE EXTENDED: one statement reads back the whole state
      val desc = spark.sql("DESCRIBE EXTENDED sct").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(desc("tier") === "STRING")
      assert(desc("Partition Spec") === "bucket(4,k)")
      assert(desc("Sort Order") === "k")
      assert(desc("Bloom Columns") === "label")
      assert(desc("Type") === "table")
      assert(desc("Branches").contains("main"))
    }
  }

  test("SHOW CREATE TABLE surfaces NESTED defaults as replayable ADD COLUMNS; DESCRIBE EXTENDED lists them (r17)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-nd").toString
    val lake = new Lakehouse(spark, root)
    withSpj(root, "ddlnd") {
      spark.sql("CREATE TABLE ddlnd.ndt (k BIGINT, " +
        "addr STRUCT<city: STRING, zip: BIGINT>) PARTITIONED BY (bucket(4, k))")
      spark.sql("INSERT INTO ddlnd.ndt VALUES (1, named_struct('city', 'NYC', 'zip', 10001L))")
      // a DEFAULTed nested add, then a LATER plain nested add — the
      // suffix rule must move BOTH to add statements so the rebuilt
      // struct keeps the field order
      spark.sql("ALTER TABLE ddlnd.ndt ADD COLUMNS (addr.country STRING DEFAULT 'FR')")
      spark.sql("ALTER TABLE ddlnd.ndt ADD COLUMNS (addr.region STRING)")
      lake.registerView("ndt", Seq("bucket(4,k)"))
      val stmts = spark.sql("SHOW CREATE TABLE ndt").collect().map(_.getString(0))
      assert(stmts.length === 3, s"CREATE + two nested adds expected: ${stmts.mkString(" | ")}")
      // the CREATE's struct stops before the defaulted field
      assert(stmts(0).contains("addr STRUCT<city: STRING, zip: BIGINT>"), stmts(0))
      assert(!stmts(0).contains("country"), stmts(0))
      assert(stmts(1) === "ALTER TABLE ndt ADD COLUMNS (addr.country STRING DEFAULT 'FR')", stmts(1))
      assert(stmts(2) === "ALTER TABLE ndt ADD COLUMNS (addr.region STRING)", stmts(2))
      // REBUILD from the emitted script in a fresh root under a new name
      val root2 = java.nio.file.Files.createTempDirectory("graft-ddl-nd2").toString
      val lake2 = new Lakehouse(spark, root2)
      spark.conf.set("spark.sql.catalog.ddlnd2", classOf[GraftSpjCatalog].getName)
      spark.conf.set("spark.sql.catalog.ddlnd2.root", root2)
      val rebuilt = stmts.map(_.replace("ndt", "ndt2"))
      spark.sql(rebuilt(0).replaceFirst("CREATE TABLE ndt2", "CREATE TABLE ddlnd2.ndt2"))
      lake2.registerView("ndt2", Seq("bucket(4,k)"))
      rebuilt.drop(1).foreach(spark.sql(_))
      // field ORDER and the nested default both round-trip
      assert(lake2.tableSchema("ndt2").fields.map(_.name).toSeq ===
        lake.tableSchema("ndt").fields.map(_.name).toSeq)
      assert(spark.table("ddlnd2.ndt2").schema("addr").dataType.catalogString ===
        spark.table("ddlnd.ndt").schema("addr").dataType.catalogString)
      assert(lake2.showCreateStatements("ndt2").map(_.replace("ndt2", "ndt")) ===
        lake.showCreateStatements("ndt").toSeq)
      // the nested CURRENT_DEFAULT is live on the rebuilt table: an
      // INSERT omitting it reads 'FR' through the declared schema
      spark.sql("INSERT INTO ddlnd2.ndt2 VALUES " +
        "(7, named_struct('city', 'SF', 'zip', 94105L, 'country', 'US', 'region', 'CA'))")
      val rebuiltAddr = spark.table("ddlnd2.ndt2").schema("addr").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(graft.sources.ColumnDefaults
        .currentSql(rebuiltAddr("country")).contains("'FR'"),
        "the rebuilt nested field must carry the DEFAULT")
      // DESCRIBE EXTENDED lists the nested default as a dotted row
      val desc = spark.sql("DESCRIBE EXTENDED ndt").collect()
        .map(r => (r.getString(0), r.getString(2)))
      assert(desc.contains(("addr.country", "DEFAULT 'FR'")),
        s"nested default row missing: ${desc.mkString(", ")}")
      // old rows (written before the add) read the default on both paths
      assert(spark.table("ddlnd.ndt").where(col("k") === 1L)
        .select(col("addr.country")).head().getString(0) === "FR")
      assert(lake.read("ndt").where(col("k") === 1L)
        .select(col("addr.country")).head().getString(0) === "FR")
    }
  }

  test("RENAME TO onto an orphan catalog line: an unpartitioned rename never inherits the orphan's spec (r16)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-orph").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    // plant the orphan: a PARTITIONED catalog line whose directory is
    // gone — exactly the residue a crashed prior rename leaves
    withSpj(root, "ddlorph") {
      spark.sql("CREATE TABLE ddlorph.orph_dst (k BIGINT, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root, "orph_dst"), true)
    assert(lake.catalogEntries().exists(_._1 == "orph_dst"),
      "precondition: the orphan line must exist with no directory")
    // an UNPARTITIONED table renames onto the orphaned name
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "orph_src")
    lake.renameTable("orph_src", "orph_dst")
    // the stale line is gone: the renamed table carries NO partition
    // spec instead of silently inheriting bucket(4,k)
    assert(!lake.catalogEntries().exists(_._1 == "orph_dst"),
      "the orphan's partitioned catalog line must be retracted")
    assert(lake.read("orph_dst").count() === 2)
  }

  test("ALTER TABLE on the catalog: ADD/RENAME/DROP COLUMN and widening TYPE, then INSERT + SPJ join stay green") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-a").toString
    withSpj(root, "ddl5") {
      import spark.implicits._
      spark.sql("CREATE TABLE ddl5.t (k BIGINT, n INT, v STRING) PARTITIONED BY (bucket(4, k))")
      (1L to 10L).map(k => (k, k.toInt, s"v$k")).toDF("k", "n", "v")
        .createOrReplaceTempView("ddl5_src")
      spark.sql("INSERT INTO ddl5.t SELECT * FROM ddl5_src")
      spark.sql("ALTER TABLE ddl5.t ADD COLUMNS (extra DOUBLE)")
      spark.sql("ALTER TABLE ddl5.t RENAME COLUMN v TO label")
      spark.sql("ALTER TABLE ddl5.t ALTER COLUMN n TYPE BIGINT")
      val t = spark.table("ddl5.t")
      assert(t.schema.fieldNames.toSeq === Seq("k", "n", "label", "extra"))
      assert(t.schema("n").dataType === org.apache.spark.sql.types.LongType)
      assert(t.where(col("extra").isNull).count() === 10)
      // post-evolution INSERT takes the new shape; both shapes serve
      spark.sql("INSERT INTO ddl5.t VALUES (11, 11, 'v11', 1.5)")
      assert(spark.table("ddl5.t").count() === 11)
      assert(spark.table("ddl5.t").where(col("label") === "v11")
        .select("extra").collect().head.getDouble(0) === 1.5)
      // the evolved table still SPJ-joins Exchange-free
      spark.sql("CREATE TABLE ddl5.d (dk BIGINT, w DOUBLE) PARTITIONED BY (bucket(4, dk))")
      spark.sql("INSERT INTO ddl5.d SELECT k, k * 2.0 FROM ddl5_src")
      val j = spark.table("ddl5.t").join(spark.table("ddl5.d"), col("k") === col("dk"))
      assert(!Medallion.plansShuffle(j),
        "evolved table must keep co-locating:\n" + j.queryExecution.executedPlan)
      assert(j.count() === 10)
      spark.sql("ALTER TABLE ddl5.t DROP COLUMN extra")
      assert(spark.table("ddl5.t").schema.fieldNames.toSeq === Seq("k", "n", "label"))
      // refusals: narrowing type, nested fields, unsupported change kinds
      // narrowing refuses — Spark's own analyzer rejects it before the
      // catalog sees the change (NOT_SUPPORTED_CHANGE_COLUMN)
      val e1 = intercept[Exception](
        spark.sql("ALTER TABLE ddl5.t ALTER COLUMN n TYPE INT"))
      assert(e1.getMessage.toLowerCase.contains("not supported") ||
        e1.getMessage.toLowerCase.contains("promote"), e1.getMessage)
      val e2 = intercept[Exception](
        spark.sql("ALTER TABLE ddl5.t SET TBLPROPERTIES ('a'='b')"))
      assert(e2.getMessage.contains("unsupported ALTER TABLE change"), e2.getMessage)
      // a historical name must not be resurrectable (takenNames rule)
      val e3 = intercept[Exception](
        spark.sql("ALTER TABLE ddl5.t ADD COLUMNS (v STRING)"))
      assert(e3.getMessage.toLowerCase.contains("v"), e3.getMessage)
    }
  }
}
