package graft

import graft.sources.Lakehouse

/** Catalog browsing through the parsed surface — the reference
  * notebook's literal first cells (query_iceberg.ipynb: `SHOW
  * CATALOGS`, `SHOW NAMESPACES IN nessie`, `SHOW TABLES IN
  * nessie.sales`). All three are driver-side metadata listings over
  * the session's registered lakes; native Spark statements keep
  * working for non-lake names. */
class ShowCatalogSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-showcat").toString

  test("SHOW CATALOGS lists spark_catalog plus each registered lake with its root") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "t_show1")
    lake.registerView("t_show1")

    val rows = spark.sql("SHOW CATALOGS").collect()
    assert(rows.map(_.getString(0)).contains("spark_catalog"))
    val lakeName = new java.io.File(root).getName
    val lakeRow = rows.find(_.getString(0) == lakeName)
    assert(lakeRow.isDefined, s"expected catalog $lakeName in ${rows.mkString(",")}")
    assert(lakeRow.get.getString(1) === root)
  }

  test("SHOW NAMESPACES / SHOW TABLES IN <lake> list the flat namespace and its tables") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t_show2")
    lake.registerView("t_show2")
    lake.createOrReplace(Seq((9L, "z")).toDF("k", "v"), "t_show3")
    lake.registerView("t_show3")
    val lakeName = new java.io.File(root).getName

    val ns = spark.sql(s"SHOW NAMESPACES IN $lakeName").collect()
    assert(ns.map(_.getString(0)).toSeq === Seq("default"))

    val tables = spark.sql(s"SHOW TABLES IN `$lakeName`").collect()
    val byName = tables.map(r => r.getString(0) -> r).toMap
    assert(byName.keySet === Set("t_show2", "t_show3"))
    assert(byName("t_show2").getLong(2) === 1L) // one snapshot
    assert(tables.forall(_.getString(3).contains("main")))
  }

  test("persisted SQL views: CREATE VIEW survives a fresh catalog open, stays live under DML, drops cleanly (r16)") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("k", "g", "w"), "vt_base")
    lake.registerView("vt_base")
    spark.sql("CREATE VIEW v_tot AS SELECT g, sum(w) AS tot FROM vt_base GROUP BY g")
    assert(spark.sql("SELECT * FROM v_tot ORDER BY g").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq === Seq(("a", 40.0), ("b", 20.0)))
    // LIVE under DML: an INSERT into the base must show through the view
    spark.sql("INSERT INTO vt_base VALUES (4, 'b', 5.0)")
    assert(spark.sql("SELECT tot FROM v_tot WHERE g = 'b'").head().getDouble(0) === 25.0)
    // a view over a view (creation order carries the dependency)
    spark.sql("CREATE VIEW v_top AS SELECT g FROM v_tot WHERE tot > 30")
    assert(spark.sql("SELECT g FROM v_top").collect().map(_.getString(0)).toSeq === Seq("a"))
    // SHOW TABLES lists both with the type column
    val lakeName = new java.io.File(root).getName
    val types = spark.sql(s"SHOW TABLES IN `$lakeName`").collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(types("vt_base") === "table" && types("v_tot") === "view" &&
      types("v_top") === "view")
    // collisions refuse in both directions
    intercept[Exception](spark.sql("CREATE VIEW vt_base AS SELECT * FROM vt_base"))
    intercept[Exception](spark.sql("CREATE VIEW v_tot AS SELECT * FROM vt_base"))
    // CREATE OR REPLACE redefines
    spark.sql("CREATE OR REPLACE VIEW v_top AS SELECT g FROM v_tot WHERE tot > 1")
    assert(spark.sql("SELECT g FROM v_top").count() === 2)
    // a FRESH session handle restores the views through openCatalog
    Seq("vt_base", "v_tot", "v_top").foreach(spark.catalog.dropTempView)
    graft.sources.LakehouseRegistry.unregister(spark, "vt_base")
    Lakehouse.openCatalog(spark, root)
    assert(spark.sql("SELECT tot FROM v_tot WHERE g = 'a'").head().getDouble(0) === 40.0)
    assert(spark.sql("SELECT g FROM v_top").count() === 2)
    // re-issuing an IDENTICAL OR REPLACE must not duplicate the line
    val nViews = lake.sqlViews().length
    spark.sql("CREATE OR REPLACE VIEW v_top AS SELECT g FROM v_tot WHERE tot > 1")
    assert(lake.sqlViews().length === nViews,
      "identical OR REPLACE must rewrite in place, not append")
    // OR REPLACE that RE-POINTS an early view at a LATER one must
    // still cold-restore: registration is reference-topological, not
    // file-ordered
    spark.sql("CREATE VIEW v_sum AS SELECT g, sum(w) AS s2 FROM vt_base GROUP BY g")
    spark.sql("CREATE OR REPLACE VIEW v_tot AS SELECT g, s2 AS tot FROM v_sum")
    Seq("vt_base", "v_tot", "v_top", "v_sum").foreach(v =>
      scala.util.Try(spark.catalog.dropTempView(v)))
    graft.sources.LakehouseRegistry.unregister(spark, "vt_base")
    Lakehouse.openCatalog(spark, root)
    assert(spark.sql("SELECT tot FROM v_tot WHERE g = 'a'").head().getDouble(0) === 40.0)
    assert(spark.sql("SELECT g FROM v_top").count() === 2,
      "a view over a re-pointed view must survive the cold restore")
    // SHOW CREATE TABLE / DESCRIBE EXTENDED serve views too (r16)
    val vc = spark.sql("SHOW CREATE TABLE v_tot").head().getString(0)
    assert(vc.startsWith("CREATE VIEW v_tot AS SELECT"), vc)
    val vd = spark.sql("DESCRIBE EXTENDED v_tot").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(vd("Type") === "view" && vd.contains("View Text") && vd("g") === "STRING")
    // DROP VIEW retracts the line and the temp view
    spark.sql("DROP VIEW v_top")
    intercept[Exception](spark.sql("SELECT * FROM v_top").collect())
    assert(!spark.sql(s"SHOW TABLES IN `$lakeName`").collect()
      .exists(_.getString(0) == "v_top"))
    // the persisted file keeps only the surviving views
    assert(lake.sqlViews().map(_._1).toSet === Set("v_tot", "v_sum"))
  }

  test("t.views metadata relation: name + SQL text + creation order, consistent after OR REPLACE / DROP (r17)") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "g", "w"), "mvr_base")
    lake.registerView("mvr_base")
    // no views yet: the relation reads EMPTY, not an error
    assert(spark.sql("SELECT * FROM mvr_base.views").count() === 0)
    spark.sql("CREATE VIEW mvr_v1 AS SELECT g, sum(w) AS tot FROM mvr_base GROUP BY g")
    spark.sql("CREATE VIEW mvr_v2 AS SELECT g FROM mvr_v1 WHERE tot > 15")
    val rows = spark.sql(
      "SELECT view, sql, created_order FROM mvr_base.views ORDER BY created_order")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq("mvr_v1", "mvr_v2"))
    assert(rows(0)._2 === "SELECT g, sum(w) AS tot FROM mvr_base GROUP BY g")
    assert(rows.map(_._3).toSeq === Seq(0L, 1L))
    // OR REPLACE rewrites IN PLACE: text changes, ordinal stays
    spark.sql("CREATE OR REPLACE VIEW mvr_v1 AS SELECT g, sum(w) AS tot, count(1) AS n FROM mvr_base GROUP BY g")
    val afterReplace = spark.sql(
      "SELECT view, sql, created_order FROM mvr_base.views ORDER BY created_order")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(afterReplace.map(_._1).toSeq === Seq("mvr_v1", "mvr_v2"))
    assert(afterReplace(0)._2.contains("count(1) AS n"))
    assert(afterReplace(0)._3 === 0L)
    // DROP compacts the ledger; the relation agrees
    spark.sql("DROP VIEW mvr_v2")
    assert(spark.sql("SELECT view FROM mvr_base.views").collect()
      .map(_.getString(0)).toSeq === Seq("mvr_v1"))
    // the relation agrees with _views.jsonl byte-for-byte
    assert(spark.sql("SELECT view, sql FROM mvr_base.views").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq === lake.sqlViews())
    // UNREGISTERED names fall through untouched — `nope.views` is not
    // a lake relation, so Spark's own resolution errors, not ours
    intercept[Exception](spark.sql("SELECT * FROM nope_such.views").collect())
  }

  test("view dependency edges are literal-blind (r17): quoted names are data, real references survive the strip") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "w"), "lb_base")
    lake.registerView("lb_base")
    // a REAL dependency wrapped in literal noise: doubled-quote
    // escapes and a mention of the view's own dependency inside
    // strings — the scanner must strip the literals WITHOUT eating
    // the FROM reference
    spark.sql("CREATE VIEW lb_v1 AS SELECT k, w, 'it''s lb_base data' AS note " +
      "FROM lb_base WHERE w > 5")
    // a view naming lb_v1 ONLY inside a literal, really over lb_base:
    // the false edge to lb_v1 is gone, the real one to lb_base stays
    spark.sql("CREATE VIEW lb_v2 AS SELECT sum(w) AS s, 'not lb_v1' AS tag " +
      "FROM lb_base")
    // live under DML through the touching-scoped re-registration
    spark.sql("INSERT INTO lb_base VALUES (3, 30.0)")
    assert(spark.sql("SELECT count(*) FROM lb_v1").head().getLong(0) === 3L)
    assert(spark.sql("SELECT s FROM lb_v2").head().getDouble(0) === 60.0)
    // cold restore re-registers both in a sound order
    Seq("lb_base", "lb_v1", "lb_v2").foreach(v =>
      scala.util.Try(spark.catalog.dropTempView(v)))
    graft.sources.LakehouseRegistry.unregister(spark, "lb_base")
    Lakehouse.openCatalog(spark, root)
    assert(spark.sql("SELECT count(*) FROM lb_v1").head().getLong(0) === 3L)
    assert(spark.sql("SELECT s FROM lb_v2").head().getDouble(0) === 60.0)
  }

  test("native SHOW TABLES and SHOW NAMESPACES still delegate for non-lake names") {
    // session catalog: must not be intercepted (name doesn't match a lake)
    val native = spark.sql("SHOW TABLES IN default")
    assert(native.columns.contains("tableName") || native.columns.contains("name"))
    val nativeNs = spark.sql("SHOW NAMESPACES IN spark_catalog").collect()
    assert(nativeNs.nonEmpty)
  }
}
